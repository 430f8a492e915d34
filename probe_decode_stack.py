"""A/B the fused decoder-stack kernel (ops/decode_stack.py) on-chip.

VERDICT r4 #4: the decode-step model portion runs ~0.85 ms vs a ~0.45 ms
HBM roofline. This probe times the FULL caption-inference program (B16,
beam5, max_len 16, 480² — the bench envelope) with cfg.decode_stack_kernel
off vs on, checks token equality, and reports the per-step decode delta
(encoder time subtracted via an encoder-only timing).

Usage: python probe_decode_stack.py  (TPU, ~5 min cold)
"""

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
    cfg0 = replace(ofa_base(), dtype="bfloat16", use_flash_attention=True)
    cfg1 = replace(cfg0, decode_stack_kernel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg0)

    B = 16
    prompt = v.encode_text(
        " what does the image describe?", append_bos=True, append_eos=True
    )
    src = jnp.asarray(np.tile(np.asarray(prompt, np.int32), (B, 1)))
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(B, 480, 480, 3), jnp.float32
    )
    masks = jnp.ones((B,), bool)
    gen_cfg = GenerationConfig(
        beam_size=5, max_len_b=16, min_len=1, no_repeat_ngram_size=3
    )
    n_steps = gen_cfg.max_len_b + 1

    def make_run(cfg):
        @jax.jit
        def run(params, src, imgs, masks, i):
            enc = ofa.encode(params, cfg, src, imgs + i, masks)
            toks, scores = beam_search(params, cfg, gen_cfg, enc, max_len=16)
            return toks, scores

        return run

    @jax.jit
    def run_enc(params, src, imgs, masks, i):
        enc = ofa.encode(params, cfg0, src, imgs + i, masks)
        return enc.x.astype(jnp.float32).mean(axis=(1, 2))

    tick = [0]

    def timed(fn, iters=5, reps=3):
        out = fn(params, src, imgs, masks, jnp.float32(0.0))
        np.asarray(jax.tree.leaves(out)[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                tick[0] += 1
                out = fn(params, src, imgs, masks, jnp.float32(tick[0]) * 1e-9)
            np.asarray(jax.tree.leaves(out)[0])
            best = min(best, (time.perf_counter() - t0) / iters)
        return best, out

    run0, run1 = make_run(cfg0), make_run(cfg1)
    t_enc, _ = timed(run_enc)
    t0_s, out0 = timed(run0)
    t1_s, out1 = timed(run1)

    toks0 = np.asarray(out0[0])
    toks1 = np.asarray(out1[0])
    match = bool((toks0 == toks1).all())
    d0 = (t0_s - t_enc) / n_steps * 1000.0
    d1 = (t1_s - t_enc) / n_steps * 1000.0
    print(f"encoder                 {t_enc*1e3:7.1f} ms")
    print(
        f"baseline (XLA scan)     {t0_s*1e3:7.1f} ms  "
        f"({B/t0_s:.1f}/s, decode {d0:.2f} ms/step)"
    )
    print(
        f"decode_stack kernel     {t1_s*1e3:7.1f} ms  "
        f"({B/t1_s:.1f}/s, decode {d1:.2f} ms/step)"
    )
    print(f"tokens_match={match}  speedup={t0_s/t1_s:.3f}x "
          f"decode_delta={d0-d1:+.2f} ms/step")


if __name__ == "__main__":
    main()
