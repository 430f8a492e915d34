"""A/B the fused int8 cross-KV decode kernel vs XLA vs the bf16 cache.

Full caption run on the real chip (fast_path + int8 output projection —
the serving config), three cache variants:
  - bf16 cross-KV (the r3 default / best known)
  - int8 cross-KV, XLA einsum path (the r2 ~6%-slower negative result)
  - int8 cross-KV, fused Pallas kernel (ops/decode_cross_attn.py)
Prints one JSON line with decode-loop ms per variant + token agreement.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from dataclasses import replace

    from musketeer_tpu.config import GenerationConfig, ofa_base
    from musketeer_tpu.generation import beam_search
    from musketeer_tpu.models import ofa
    from musketeer_tpu.tokenization import default_vocab

    v = default_vocab()
    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    params_q = ofa.quantize_output_proj(params)

    B = 16
    prompt = v.encode_text(
        " what does the image describe?", append_bos=True, append_eos=True
    )
    src = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, 480, 480, 3), jnp.float32)
    masks = jnp.ones((B,), bool)

    _tick = [0]

    def timed(fn, p, iters=8, reps=4):
        np.asarray(jax.tree.leaves(fn(p, src, imgs, masks, jnp.float32(0.0)))[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                _tick[0] += 1
                out = fn(p, src, imgs, masks, jnp.float32(_tick[0]) * 1e-9)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def make_run(mcfg, int8_kv):
        gen_cfg = GenerationConfig(
            beam_size=5, max_len_b=16, min_len=1, no_repeat_ngram_size=3,
            use_fast_path=True, int8_cross_kv=int8_kv,
        )

        @jax.jit
        def run(params, src, imgs, masks, i):
            enc = ofa.encode(params, mcfg, src, imgs + i, masks)
            toks, scores = beam_search(params, mcfg, gen_cfg, enc, max_len=16)
            return toks.sum(axis=(1, 2)), scores.mean(axis=1)

        return run

    @jax.jit
    def run_encoder(params, src, imgs, masks, i):
        enc = ofa.encode(params, cfg, src, imgs + i, masks)
        return enc.x.astype(jnp.float32).mean(axis=(1, 2))

    enc_s = timed(run_encoder, params_q)
    out = {"encoder_ms": round(enc_s * 1e3, 1)}
    variants = (
        ("bf16_kv", make_run(cfg, False)),
        ("int8kv_xla", make_run(
            replace(cfg, decode_int8_kv_kernel=False), True)),
        ("int8kv_kernel", make_run(cfg, True)),
    )
    toks = {}
    for name, run in variants:
        s = timed(run, params_q)
        out[f"{name}_full_ms"] = round(s * 1e3, 1)
        out[f"{name}_decode_ms"] = round((s - enc_s) * 1e3, 1)
        out[f"{name}_sps"] = round(B / s, 1)
        toks[name] = np.asarray(
            run(params_q, src, imgs, masks, jnp.float32(0.0))[0])
        print(name, out[f"{name}_decode_ms"], flush=True)
    out["kernel_matches_xla_tokens"] = bool(
        np.array_equal(toks["int8kv_xla"], toks["int8kv_kernel"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
