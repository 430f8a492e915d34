"""Flash-bwd (block_q, block_b, stream_lse) sweep at the encoder train shape.

Times the custom-VJP attention fwd+bwd in isolation, fori_loop'd,
B8 H12 S980 D64 bf16.

MEASURED (on-chip, 2026-08-18): streamed lse (sl1) beats the in-kernel
normalizer recompute (sl0) — bq256_bb2 6.18 vs 6.71 ms, bq128_bb2 6.55 vs
6.95 — and block_b=4/8 still fail to compile even with the lse stream
dropped (remote compiler 500, consistent with the earlier 16.17 MB scoped
VMEM OOM). BWD_STREAM_LSE stays True; the drel nbc-reduction lever is
exhausted at this shape.
"""

import functools
import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import musketeer_tpu.ops.flash_attention_bwd as fab

    B, H, S, D = 8, 12, 980, 64
    rng = np.random.RandomState(0)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh), jnp.bfloat16) * 0.2
    q, k, v, pq, pk = (mk(B, H, S, D) for _ in range(5))
    rel = mk(H, S, S)
    kpad = jnp.zeros((B, S), bool).at[:, -17:].set(True)
    cot = mk(B, H, S, D)

    out = {}
    # (block_q, block_b, stream_lse): the True rows are the pre-change
    # baseline (lse streamed from the forward) for the recompute A/B.
    sweeps = (
        (256, 2, True), (128, 2, True),
        (256, 2, False), (128, 2, False),
        (128, 4, False), (256, 4, False), (128, 8, False),
    )
    for bq, bb, sl in sweeps:
        orig = fab._bwd

        def bwd_patch(res, causal, block_q, interpret, need_drel, do,
                      block_b=None, _orig=orig, _bb=bb, _sl=sl, **kw):
            kw["stream_lse"] = _sl
            return _orig(res, causal, block_q, interpret, need_drel, do,
                         block_b=_bb, **kw)

        fab._bwd = bwd_patch
        try:
            def loss(q_, k_, v_, pq_, pk_, rel_):
                o = fab.flash_attention_bias_trainable(
                    q_, k_, v_, pq_, pk_, rel_, kpad, False, bq, False, True,
                    False,
                )
                return jnp.sum(o.astype(jnp.float32) * cot.astype(jnp.float32))

            g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5))

            def step(q_, k_, v_, pq_, pk_, rel_):
                def body(i, c):
                    l, gr = g(q_ + (c * 0).astype(q_.dtype), k_, v_, pq_, pk_, rel_)
                    return c + l * 1e-9 + sum(
                        jnp.sum(x.astype(jnp.float32)) for x in gr) * 1e-12
                return jax.lax.fori_loop(0, 10, body, jnp.zeros((), jnp.float32))

            f = jax.jit(step)
            r = np.asarray(f(q, k, v, pq, pk, rel))
            t0 = time.perf_counter()
            r = np.asarray(f(q, k, v, pq, pk, rel))
            ms = (time.perf_counter() - t0) / 10 * 1000
            out[f"bq{bq}_bb{bb}_sl{int(sl)}"] = {"ms": round(ms, 2)}
        except Exception as e:
            out[f"bq{bq}_bb{bb}_sl{int(sl)}"] = {"err": str(e)[:120]}
        finally:
            fab._bwd = orig
        print(f"bq{bq}_bb{bb}_sl{int(sl)}", out[f"bq{bq}_bb{bb}_sl{int(sl)}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
