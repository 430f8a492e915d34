"""A/B the hoisted rel-bias gather layout (the encoder's [L,H,T,T] build).

current: flat[Vb, L*H][rp.flat]            -> [T*T, 72] -> reshape -> BIG transpose
cand:    flatT[L*H, Vb][:, rp.flat]        -> [72, T*T] -> reshape (no transpose)

fwd+bwd (the backward is the scatter-add into the table) at the encoder
image shape T=900, Vb=6897-ish, L=6, H=12, bf16.
"""

import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    L, H, T, Vb = 6, 12, 900, 6897
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(L, Vb, H), jnp.float32) * 0.02
    rp = jnp.asarray(rng.randint(0, Vb, (T, T)), jnp.int32)
    cot = jnp.asarray(rng.randn(L, H, T, T), jnp.bfloat16)

    def cur(tb):
        tbc = tb.astype(jnp.bfloat16)
        flat = tbc.transpose(1, 0, 2).reshape(Vb, L * H)[rp.reshape(-1)]
        return flat.reshape(T, T, L, H).transpose(2, 3, 0, 1)

    def cand(tb):
        tbc = tb.astype(jnp.bfloat16)
        flatT = tbc.transpose(0, 2, 1).reshape(L * H, Vb)
        out = jnp.take(flatT, rp.reshape(-1), axis=1)
        return out.reshape(L, H, T, T)

    out = {}
    for name, f in (("cur", cur), ("cand", cand)):
        def loss(tb, f=f):
            return jnp.sum(f(tb).astype(jnp.float32) * cot.astype(jnp.float32))

        def step(tb):
            l, g = jax.value_and_grad(loss)(tb)
            return l + jnp.sum(g * g)

        jf = jax.jit(step)
        r = np.asarray(jf(table))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            r = np.asarray(jf(table))
        out[name] = {"ms": round((time.perf_counter() - t0) / n * 1000, 2)}
        print(name, out[name], flush=True)

    # equivalence
    a, b = np.asarray(cur(table), np.float32), np.asarray(cand(table), np.float32)
    out["max_abs_diff"] = float(np.max(np.abs(a - b)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
