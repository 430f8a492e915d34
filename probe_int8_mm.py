"""Raw int8-vs-bf16 matmul rate at encoder shapes (W8A8 feasibility gate).

v5e's MXU lists 2x int8 peak (394 vs 197 T). Whether XLA actually
delivers it — and whether the dynamic-quantize (absmax per row) +
dequant-scale epilogue eats the gain — decides if a W8A8 encoder
serving variant is worth building. Shapes = the OFA-base encoder hot
matmuls at the inference envelope (B16 x S908 rows).

Usage: python probe_int8_mm.py
"""

import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    M = 16 * 908  # B*S rows
    shapes = [
        (M, 768, 768),    # q/k/v/o projections
        (M, 768, 3072),   # fc1
        (M, 3072, 768),   # fc2
    ]
    rng = np.random.RandomState(0)

    def timed(fn, *args, iters=20, reps=3):
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

    for (m, k, n) in shapes:
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n), jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
        wscale = jnp.asarray(rng.rand(n) + 0.5, jnp.float32)

        # one fori_loop per measurement: per-dispatch tunnel floor is ~2.5ms
        def loop(body, x0):
            @jax.jit
            def run(a, b):
                def step(i, acc):
                    return body(a, b, acc, i)
                return jax.lax.fori_loop(0, 8, step, x0)
            return run

        # Two traps to defeat (both measured): (1) a plain slice/sum
        # reduction lets XLA rewrite slice-of-dot into dot-of-slice (all
        # shapes "ran" in 0.3 ms); (2) a loop-invariant dot gets hoisted
        # out of the fori_loop entirely (bf16 "370 TFLOP/s" on a 197T
        # chip). So: perturb the activation with the loop index and
        # reduce with sum(o*o), which has no factorization.
        def sq(o):
            of = o.astype(jnp.float32)
            return jnp.sum(of * of) * 1e-9

        bf16 = loop(
            lambda a, b, acc, i: acc
            + sq((a + i.astype(a.dtype)) @ b),
            jnp.float32(0.0),
        )
        t_bf16 = timed(bf16, x, w) / 8

        i8 = loop(
            lambda a, b, acc, i: acc
            + sq(jax.lax.dot_general(
                a + i.astype(jnp.int8), b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )),
            jnp.float32(0.0),
        )
        t_i8 = timed(i8, xi, wi) / 8

        # W8A8 with the full serving epilogue: dynamic per-row absmax
        # quantize of the bf16 activations + dequant scales on the output
        def w8a8(a, b, acc, i):
            a = a + i.astype(a.dtype) * 1e-6
            s = jnp.max(jnp.abs(a.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
            aq = jnp.clip(
                jnp.round(a.astype(jnp.float32) / s), -127, 127
            ).astype(jnp.int8)
            o = jax.lax.dot_general(
                aq, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            o = o.astype(jnp.float32) * s * wscale[None, :] / 127.0
            return acc + jnp.sum(o * o) * 1e-9

        t_w8a8 = timed(loop(w8a8, jnp.float32(0.0)), x, wi) / 8

        tflops = 2 * m * k * n / 1e12
        print(
            f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:.3f} ms ({tflops/t_bf16:.0f} T) | "
            f"pure-int8 {t_i8*1e3:.3f} ms ({tflops/t_i8:.0f} T) | "
            f"W8A8+quant+dequant {t_w8a8*1e3:.3f} ms ({tflops/t_w8a8:.0f} T)",
            flush=True,
        )


if __name__ == "__main__":
    main()
