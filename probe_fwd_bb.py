"""Flash FWD (block_q, block_b) sweep at the inference encoder shape.

The forward kernel fetches the [H, S, S] rel block once per batch chunk;
at B16 the default block_b=4 streams rel 4x per layer (~25 MB bf16 each
at Sp=1024). Larger chunks amortize it — VMEM bound: kc+v double-buffered
are ~0.8 MB x block_b. Times the fwd-only kernel, fori_loop'd,
B16 H12 S980 D64 bf16 (the caption-bench encoder shape).

MEASURED (on-chip, 2026-08-18): bb8 4.375 vs bb4 4.416 ms — within noise
(the kernel is not rel-fetch bound); bb16 / bq256+ fail to compile (VMEM).
FWD_BLOCK_B stays at the call-site default 4 (bb8 would also change the
train forward's chunking for no measured gain).
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import musketeer_tpu.ops.flash_attention_bwd as fab

    B, H, S, D = 16, 12, 980, 64
    rng = np.random.RandomState(0)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh), jnp.bfloat16) * 0.2
    q, k, v, pq, pk = (mk(B, H, S, D) for _ in range(5))
    rel = mk(H, S, S)
    kpad = jnp.zeros((B, S), bool).at[:, -17:].set(True)

    out = {}
    for bq, bb in ((128, 4), (128, 8), (128, 16), (256, 8), (256, 16),
                   (512, 8)):
        fab.FWD_BLOCK_B = bb
        try:
            def step(q_, k_, v_, pq_, pk_, rel_):
                def body(i, c):
                    o = fab.flash_attention_bias_trainable(
                        q_ + (c * 0).astype(q_.dtype), k_, v_, pq_, pk_,
                        rel_, kpad, False, bq, False, True, False)
                    return c + jnp.sum(o.astype(jnp.float32)) * 1e-9
                return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))

            f = jax.jit(step)
            r = np.asarray(f(q, k, v, pq, pk, rel))
            t0 = time.perf_counter()
            r = np.asarray(f(q, k, v, pq, pk, rel))
            ms = (time.perf_counter() - t0) / 20 * 1000
            out[f"bq{bq}_bb{bb}"] = {"ms": round(ms, 3)}
        except Exception as e:
            out[f"bq{bq}_bb{bb}"] = {"err": str(e)[:120]}
        finally:
            fab.FWD_BLOCK_B = None
        print(f"bq{bq}_bb{bb}", out[f"bq{bq}_bb{bb}"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
