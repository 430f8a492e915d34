"""A/B the fused Pallas projection fast path vs the full-vocab XLA beam body.

Measures, on the real chip (bench.py timing style: varying inputs, tiny
outputs, async-pipelined iters, best-of-reps):
  - encoder only (to subtract)
  - full caption run, fast_path ON  (bf16 + int8-outproj)
  - full caption run, fast_path OFF (bf16 + int8-outproj)
Prints one JSON line with decode-loop ms for each variant.
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

    def make_run(fast):
        gen_cfg = GenerationConfig(
            beam_size=5, max_len_b=16, min_len=1, no_repeat_ngram_size=3,
            use_fast_path=fast,
        )

        @jax.jit
        def run(params, src, imgs, masks, i):
            enc = ofa.encode(params, cfg, src, imgs + i, masks)
            toks, scores = beam_search(params, cfg, gen_cfg, enc, max_len=16)
            return toks.sum(axis=(1, 2)), scores.mean(axis=1)

        return run

    @jax.jit
    def run_encoder(params, src, imgs, masks, i):
        enc = ofa.encode(params, cfg, src, imgs + i, masks)
        return enc.x.astype(jnp.float32).mean(axis=(1, 2))

    enc_s = timed(run_encoder, params)
    out = {"encoder_ms": round(enc_s * 1e3, 1)}
    run_fast, run_slow = make_run(True), make_run(False)
    for name, run, p in (
        ("fast_bf16", run_fast, params),
        ("slow_bf16", run_slow, params),
        ("fast_int8", run_fast, params_q),
        ("slow_int8", run_slow, params_q),
    ):
        s = timed(run, p)
        out[f"{name}_full_ms"] = round(s * 1e3, 1)
        out[f"{name}_decode_ms"] = round((s - enc_s) * 1e3, 1)
        out[f"{name}_sps"] = round(B / s, 1)
    # token-exactness check fast vs slow (greedy-ish beam on real shapes)
    tf, sf = run_fast(params, src, imgs, masks, jnp.float32(0.0))
    ts, ss = run_slow(params, src, imgs, masks, jnp.float32(0.0))
    out["tokens_match"] = bool(np.array_equal(np.asarray(tf), np.asarray(ts)))
    out["scores_close"] = bool(
        np.allclose(np.asarray(sf), np.asarray(ss), atol=2e-3)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
