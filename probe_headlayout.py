"""Head-split layout probe: can the projection dot EMIT [B, H, T, hd]
directly (einsum 'btd,dhe->bhte') cheaper than dot + _split_heads
transpose? The split/merge transposes around the Pallas kernels rank
7.1 M cycles (~6 ms) of the B8 train step, ~40x off their bandwidth
roofline (minor-dim transposes shuffle the 64-lane axis across
sublanes), and Mosaic cannot express head-last per-head blocks (block
dim -2 must be divisible by 8 or equal the array dim), so folding the
transpose into the dot is the remaining route.

Usage: python probe_headlayout.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    B, T, d, H = 8, 980, 768, 12
    hd = d // H
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, d) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.randn(d, d) * 0.05, jnp.bfloat16)
    b = jnp.asarray(rng.randn(d) * 0.05, jnp.bfloat16)
    w3 = w.reshape(d, H, hd)
    b3 = b.reshape(H, hd)
    r = jnp.asarray(rng.randn(B, H, T, hd) * 0.1, jnp.bfloat16)  # cotangent

    def timed(fn, *args, iters=8, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    # perturb with a loop to defeat hoisting; sum(o*o) defeats slice-of-dot
    def loop8(body):
        @jax.jit
        def run(x, w, b):
            def step(i, acc):
                return acc + body(x + i.astype(x.dtype) * 1e-6, w, b)
            return jax.lax.fori_loop(0, 8, step, jnp.float32(0.0))
        return run

    def red(o):
        of = o.astype(jnp.float32)
        return jnp.sum(of * of) * 1e-9

    # 1) dot + transpose (the current _split_heads path)
    split = loop8(lambda x, w, b: red(
        (x @ w + b).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
    ))
    t_split = timed(split, x, w, b) / 8

    # 2) einsum emitting BHTD directly
    ein = loop8(lambda x, w, b: red(
        jnp.einsum("btd,dhe->bhte", x, w3) + b3[None, :, None, :]
    ))
    t_ein = timed(ein, x, w3, b) / 8

    # 3) plain dot, no transpose (lower bound)
    plain = loop8(lambda x, w, b: red(x @ w + b))
    t_plain = timed(plain, x, w, b) / 8

    print(f"fwd: dot+transpose {t_split*1e3:.3f} ms | einsum-bhte "
          f"{t_ein*1e3:.3f} ms | dot-only {t_plain*1e3:.3f} ms", flush=True)

    # gradient side: d/dx of sum(out * r) — exercises the merge-transpose
    # (cotangent [B,H,T,hd] → projection bwd)
    def gsplit(x, w, b):
        return red(jax.grad(lambda xx: jnp.sum(
            ((xx @ w + b).reshape(B, T, H, hd).transpose(0, 2, 1, 3)
             * r).astype(jnp.float32)))(x))

    def gein(x, w, b):
        return red(jax.grad(lambda xx: jnp.sum(
            ((jnp.einsum("btd,dhe->bhte", xx, w3) + b3[None, :, None, :])
             * r).astype(jnp.float32)))(x))

    t_gs = timed(loop8(gsplit), x, w, b) / 8
    t_ge = timed(loop8(gein), x, w3, b) / 8
    print(f"fwd+dx: dot+transpose {t_gs*1e3:.3f} ms | einsum {t_ge*1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
