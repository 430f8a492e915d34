"""VPU-pass ablation for the inference flash kernel at the bench shape.

The encoder layers cost ~3.5 ms/layer at B16/S≈910 while the MXU work is
~0.3 ms — the kernel is bound by VPU passes over the [bq, S] fp32 score
tile (dot, +pos dot, +rel, pad-where, [causal-where], max, exp, sum,
convert, div). This probe measures whether cutting passes helps:

  base   : flash_attention_inference as shipped
  fuse   : rel add + pad mask in ONE expression (no pre-astype'd f32 rel
           copy; w = where(pad, NEG, w + rel))
  bexp   : exp in bf16 after the fp32 max-subtract; denominator sums the
           SAME bf16 values in fp32 accumulation (softmax still sums to 1)
  fuse+bexp, fuse+bexp+skipmax

Each variant times N iterations inside one jitted fori_loop (axon
per-dispatch floor ~2.5 ms) and reports max|Δ| vs the XLA reference.
"""

import functools
import json
import time

import numpy as np


def build_kernel(fuse_masks, bf16_exp, skip_max):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    NEG_INF = -1e9

    def _kernel(q_ref, pq_ref, k_ref, pk_ref, v_ref, rel_ref, kpad_ref,
                o_ref, *, block_b):
        S = k_ref.shape[1]
        for c in range(block_b):
            w = jax.lax.dot_general(
                q_ref[c], k_ref[c], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            w += jax.lax.dot_general(
                pq_ref[c], pk_ref[c], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pad = kpad_ref[pl.program_id(0) * block_b + c, :] != 0
            if fuse_masks:
                w = jnp.where(pad[None, :], NEG_INF,
                              w + rel_ref[...][:, :S])
            else:
                rel = rel_ref[...][:, :S].astype(jnp.float32)
                w = w + rel
                w = jnp.where(pad[None, :], NEG_INF, w)
            if skip_max:
                e = jnp.exp(w)
                denom = jnp.maximum(
                    jnp.sum(e, axis=-1, keepdims=True), 1e-38)
            elif bf16_exp:
                m = jnp.max(w, axis=-1, keepdims=True)
                e = jnp.exp((w - m).astype(jnp.bfloat16))
                denom = jnp.sum(e.astype(jnp.float32), axis=-1,
                                keepdims=True)
            else:
                m = jnp.max(w, axis=-1, keepdims=True)
                e = jnp.exp(w - m)
                denom = jnp.sum(e, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                e.astype(v_ref.dtype), v_ref[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[c] = (acc / denom).astype(o_ref.dtype)

    def run(q, k, v, pq, pk, rel, kpad, block_q=256, block_b=4):
        B, H, T, D = q.shape
        S = k.shape[2]
        BC = next(c for c in (block_b, 2, 1) if B % c == 0)
        bq = min(block_q, -(-T // 8) * 8)
        grid = (B // BC, H, -(-T // bq))
        row4 = pl.BlockSpec((BC, None, bq, D), lambda b, h, i: (b, h, i, 0))
        full4 = pl.BlockSpec((BC, None, S, D), lambda b, h, i: (b, h, 0, 0))
        Sr = rel.shape[2]
        return pl.pallas_call(
            functools.partial(_kernel, block_b=BC),
            grid=grid,
            in_specs=[row4, row4, full4, full4, full4,
                      pl.BlockSpec((None, bq, Sr), lambda b, h, i: (h, i, 0)),
                      pl.BlockSpec((B, S), lambda b, h, i: (0, 0))],
            out_specs=row4,
            out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        )(q, pq, k, pk, v, rel, kpad.astype(jnp.int32))

    return run


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from musketeer_tpu.ops.flash_attention import attention_reference
    from musketeer_tpu.ops.flash_attention_infer import (
        flash_attention_inference,
    )

    B, H, T, D = 16, 12, 910, 64
    S = T
    rs = np.random.RandomState(0)
    mk = lambda *sh: jnp.asarray(rs.randn(*sh) * 0.3, jnp.bfloat16)
    q, k, v = mk(B, H, T, D), mk(B, H, S, D), mk(B, H, S, D)
    pq, pk = mk(B, H, T, D), mk(B, H, S, D)
    rel = mk(H, T, S)
    kpad = jnp.zeros((B, S), bool).at[0, -7:].set(True)

    ref = attention_reference(
        q, k, v, pq, pk, rel, kpad, causal=False
    ).astype(jnp.float32)

    N_IT = 20

    def timed_loop(op, n=N_IT, reps=4):
        @jax.jit
        def runf(seed):
            def body(i, c):
                return c + op(c * 1e-9 + seed * 1e-9)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        float(runf(jnp.float32(1.0)))
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            float(runf(jnp.float32(r + 2.0)))
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    out = {}

    def base_op(eps):
        o = flash_attention_inference(
            q + eps.astype(q.dtype), k, v, pq, pk, rel, kpad, block_q=256
        )
        return o.astype(jnp.float32).sum()

    out["base_ms"] = round(timed_loop(base_op), 3)
    d = flash_attention_inference(q, k, v, pq, pk, rel, kpad, block_q=256)
    out["base_maxdiff"] = float(
        jnp.max(jnp.abs(d.astype(jnp.float32) - ref)))
    print("base", out, flush=True)

    for name, flags in (
        ("base_bb2", (False, False, False)),
        ("bexp_bb2", (False, True, False)),
        ("fuse_bexp_bb2", (True, True, False)),
        ("fuse_skipmax_bb2", (True, False, True)),
    ):
        krn = build_kernel(*flags)

        def op(eps, _k=krn):
            o = _k(q + eps.astype(q.dtype), k, v, pq, pk, rel, kpad,
                   block_b=2)
            return o.astype(jnp.float32).sum()

        out[f"{name}_ms"] = round(timed_loop(op), 3)
        d = krn(q, k, v, pq, pk, rel, kpad, block_b=2)
        out[f"{name}_maxdiff"] = float(
            jnp.max(jnp.abs(d.astype(jnp.float32) - ref)))
        print(name, {k_: out[k_] for k_ in out if k_.startswith(name)},
              flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
