"""A/B the unpacked inference flash kernel vs the packed+padded forward.

Times the bench encoder (B16, 480², S≈910 — the shape where the pad-once
gate correctly stays OFF, so the packed path pays per-layer pack/pad
copies) and the full caption run, toggling
flash_attention_bwd.INFER_UNPACKED. Prints one JSON line with per-variant
encoder/full/decode ms + token agreement.
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
    from musketeer_tpu.ops import flash_attention_bwd as fab
    from musketeer_tpu.tokenization import default_vocab

    v = default_vocab()
    cfg = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)

    B = 16
    prompt = v.encode_text(
        " what does the image describe?", append_bos=True, append_eos=True
    )
    src = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    imgs = jnp.asarray(np.random.RandomState(0).rand(B, 480, 480, 3), jnp.float32)
    masks = jnp.ones((B,), bool)
    gen_cfg = GenerationConfig(
        beam_size=5, max_len_b=16, min_len=1, no_repeat_ngram_size=3,
    )

    _tick = [0]

    def timed(fn, iters=8, reps=4):
        np.asarray(jax.tree.leaves(fn(params, src, imgs, masks, jnp.float32(0.0)))[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                _tick[0] += 1
                out = fn(params, src, imgs, masks, jnp.float32(_tick[0]) * 1e-9)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    out = {}
    toks = {}
    for name, flag in (("packed", False), ("unpacked", True)):
        fab.INFER_UNPACKED = flag

        @jax.jit
        def run_encoder(params, src, imgs, masks, i):
            enc = ofa.encode(params, cfg, src, imgs + i, masks)
            return enc.x.astype(jnp.float32).mean(axis=(1, 2))

        @jax.jit
        def run(params, src, imgs, masks, i):
            enc = ofa.encode(params, cfg, src, imgs + i, masks)
            t, s = beam_search(params, cfg, gen_cfg, enc, max_len=16)
            return t.sum(axis=(1, 2)), s.mean(axis=1)

        enc_s = timed(run_encoder)
        full_s = timed(run)
        out[f"{name}_encoder_ms"] = round(enc_s * 1e3, 1)
        out[f"{name}_full_ms"] = round(full_s * 1e3, 1)
        out[f"{name}_decode_ms"] = round((full_s - enc_s) * 1e3, 1)
        out[f"{name}_sps"] = round(B / full_s, 1)
        toks[name] = np.asarray(run(params, src, imgs, masks, jnp.float32(0.0))[0])
        print(name, out, flush=True)
    out["tokens_match"] = bool(np.array_equal(toks["packed"], toks["unpacked"]))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
