"""Microbench the encoder attention kernel pieces at the train shape.

Shape: B8, H12, S980 (pads to 1024), hd64 — the 6-layer encoder fwd+bwd
was measured at ~117ms of the 159ms B8 train step (probe_train.py), so
this isolates flash fwd, flash fwd+bwd, XLA-attention equivalents, and an
FFN-matmul calibration point. Each measurement runs N iterations inside a
single jitted fori_loop (the axon per-dispatch floor makes multi-dispatch
timing useless).
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

    from musketeer_tpu.ops.flash_attention_bwd import (
        flash_attention_bias_trainable,
    )
    from musketeer_tpu.ops.flash_attention import attention_reference

    B, H, S, D = 8, 12, 980, 64
    rs = np.random.RandomState(0)
    mk = lambda *sh: jnp.asarray(rs.randn(*sh) * 0.1, jnp.bfloat16)
    q, k, v = mk(B, H, S, D), mk(B, H, S, D), mk(B, H, S, D)
    pq, pk = mk(B, H, S, D), mk(B, H, S, D)
    rel = mk(H, S, S)
    kpad = jnp.zeros((B, S), bool)

    N_IT = 20

    def timed_loop(op, n=N_IT, reps=4):
        """op: scalar-perturbation -> scalar. Runs inside one dispatch."""

        @jax.jit
        def run(seed):
            def body(i, c):
                return c + op(c * 1e-9 + seed * 1e-9)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(run(jnp.float32(1.0)))  # compile
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(run(jnp.float32(r + 2.0)))
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3  # ms per iteration

    out = {}

    # dispatch/loop overhead floor
    out["loop_floor_ms"] = round(
        timed_loop(lambda eps: (q[0, 0, 0, 0].astype(jnp.float32) + eps)), 3
    )

    def flash_fwd(eps, bq=128):
        o = flash_attention_bias_trainable(
            q + eps.astype(q.dtype), k, v, pq, pk, rel, kpad,
            False, bq, False, True, False,
        )
        return o.astype(jnp.float32).mean()

    out["flash_fwd_ms"] = round(timed_loop(flash_fwd), 3)
    out["flash_fwd_bq256_ms"] = round(
        timed_loop(functools.partial(flash_fwd, bq=256)), 3
    )

    def flash_fwd_bwd(eps, bq=128, need_drel=True):
        def f(q_, k_, v_, pq_, pk_, rel_):
            o = flash_attention_bias_trainable(
                q_, k_, v_, pq_, pk_, rel_, kpad,
                False, bq, False, need_drel, False,
            )
            return o.astype(jnp.float32).mean()

        g = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            q + eps.astype(q.dtype), k, v, pq, pk, rel
        )
        return sum(x.astype(jnp.float32).ravel()[0] for x in g)

    out["flash_fwd_bwd_ms"] = round(timed_loop(flash_fwd_bwd), 3)
    out["flash_fwd_bwd_nodrel_ms"] = round(
        timed_loop(functools.partial(flash_fwd_bwd, need_drel=False)), 3
    )
    out["flash_fwd_bwd_bq256_ms"] = round(
        timed_loop(functools.partial(flash_fwd_bwd, bq=256)), 3
    )

    def xla_fwd(eps):
        o = attention_reference(
            q + eps.astype(q.dtype), k, v, pq, pk, rel, kpad
        )
        return o.astype(jnp.float32).mean()

    out["xla_fwd_ms"] = round(timed_loop(xla_fwd), 3)

    def xla_fwd_bwd(eps):
        def f(q_, k_, v_, pq_, pk_, rel_):
            return attention_reference(q_, k_, v_, pq_, pk_, rel_, kpad).astype(
                jnp.float32
            ).mean()

        g = jax.grad(f, argnums=(0, 1, 2, 3, 4, 5))(
            q + eps.astype(q.dtype), k, v, pq, pk, rel
        )
        return sum(x.astype(jnp.float32).ravel()[0] for x in g)

    out["xla_fwd_bwd_ms"] = round(timed_loop(xla_fwd_bwd), 3)

    # FFN calibration: one encoder layer's MLP fwd+bwd at the same token count
    d_model, d_ff = 768, 3072
    x = jnp.asarray(rs.randn(B * S, d_model) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rs.randn(d_model, d_ff) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rs.randn(d_ff, d_model) * 0.02, jnp.bfloat16)

    def ffn_fwd_bwd(eps):
        def f(w1_, w2_):
            h = jax.nn.gelu((x + eps.astype(x.dtype)) @ w1_)
            return (h @ w2_).astype(jnp.float32).mean()

        g1, g2 = jax.grad(f, argnums=(0, 1))(w1, w2)
        return g1.astype(jnp.float32).ravel()[0] + g2.astype(jnp.float32).ravel()[0]

    out["ffn_fwd_bwd_ms"] = round(timed_loop(ffn_fwd_bwd), 3)

    # rel-bias machinery at the encoder image shape: all-layer lane-dense
    # gather + per-layer [H,S,S] compose (fwd) and the scatter-add backward
    L, Vb, NN = 6, 1068, 900
    table = jnp.asarray(rs.randn(L, Vb, H) * 0.1, jnp.float32)
    tok_table = jnp.asarray(rs.randn(L, 80 * 2, H) * 0.1, jnp.float32)
    rp = jnp.asarray(rs.randint(0, Vb, (NN, NN)), jnp.int32)
    tok_rp = jnp.asarray(rs.randint(0, 160, (80, 80)), jnp.int32)
    SS = NN + 80

    def rel_machinery(eps, with_compose=True):
        def f(tbl, ttbl):
            flat = tbl.transpose(1, 0, 2).reshape(Vb, L * H)[rp.reshape(-1)]
            rimg = flat.reshape(NN, NN, L, H).transpose(2, 3, 0, 1)
            tflat = ttbl.transpose(1, 0, 2).reshape(160, L * H)[
                tok_rp.reshape(-1)
            ]
            rtok = tflat.reshape(80, 80, L, H).transpose(2, 3, 0, 1)
            rimg = rimg.astype(jnp.bfloat16)
            rtok = rtok.astype(jnp.bfloat16)
            if with_compose:
                acc = jnp.float32(0.0)
                for i in range(L):
                    rel = jnp.zeros((H, SS, SS), jnp.bfloat16)
                    rel = rel.at[:, SS - 80 :, SS - 80 :].set(rtok[i])
                    rel = rel.at[:, :NN, :NN].set(rimg[i])
                    acc += rel.astype(jnp.float32).mean()
                return acc
            return (
                rimg.astype(jnp.float32).mean()
                + rtok.astype(jnp.float32).mean()
            )

        g1, g2 = jax.grad(f, argnums=(0, 1))(table + eps, tok_table)
        return g1.ravel()[0] + g2.ravel()[0]

    out["rel_machinery_fwd_bwd_ms"] = round(timed_loop(rel_machinery), 3)
    out["rel_gather_only_fwd_bwd_ms"] = round(
        timed_loop(functools.partial(rel_machinery, with_compose=False)), 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
