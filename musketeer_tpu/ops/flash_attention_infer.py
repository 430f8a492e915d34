"""Inference-only flash attention on UNPACKED, UNPADDED streams.

The trainable kernel (ops/flash_attention_bwd.py) packs content|positional
projections along the head dim (qc = [q|pos_q], kc = [k|pos_k]) and pads
every stream to tile multiples before the pallas_call. That layout is right
for training — the packed/padded streams ride the VJP residuals and the
backward re-runs none of the copies — but in pure inference the pack/pad
passes are pure overhead: at the bench encoder shape (B16, S≈910 → 1024,
where the pad-once gate correctly stays off) they materialize ~150 MB of
HBM copies per layer and the kernel then runs 12.5 % padded rows/cols of
softmax work. The compiled-HLO cycle ranking put the concat/pad fusions at
~2.3 M cycles/layer — on par with the layer's entire matmul budget.

This kernel instead takes q, pos_q, k, pos_k, v as five separate streams at
their NATIVE shapes and computes

  w = q·kᵀ + pos_q·pos_kᵀ (+ rel) (+ causal/pad masks) → softmax → ·v

with two 64-deep MXU dots replacing the packed 128-deep one (identical
math). Mosaic handles the non-tile-multiple shapes natively: S rides as a
full-dim odd lane width and the last q tile is a masked partial. No lse
output — nothing consumes it forward-only.

MEASURED RESULT (probe_infer_kernel.py, on-chip A/B at the bench encoder
shape B16/S≈910): exact parity — 56.2 ms encoder / 191 samples/s full run
under BOTH variants, tokens byte-equal. The pack/pad fusions the HLO cycle
ranking flagged overlap with the kernel's own execution, and the second
64-deep QK dot pass costs about what the copies saved. Kept as the
inference default anyway: it removes ~125 MB/layer of padded stream
materialization (HBM headroom), runs odd shapes without the 12.5 % padded
softmax rows, skips the zeros-rel stream entirely in cross attention
(need_drel=False), and decouples pure inference from the pad-once gate.

Used as the PRIMAL of flash_attention_bias_trainable: jitted inference
programs (beam-search encoder, allcand teacher-forced scoring) hit this
kernel automatically, while jax.grad traces the packed forward via the
custom_vjp's fwd rule. Numerics match the packed kernel exactly up to dot
order (two fp32 partial dots vs one): same masks, same softmax, same
epsilon-free denominator in the non-skip_max path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _round_up(x, m):
    return -(-x // m) * m


def _kernel(*refs, causal, block_q, block_b, skip_max, has_rel):
    if has_rel:
        q_ref, pq_ref, k_ref, pk_ref, v_ref, rel_ref, kpad_ref, o_ref = refs
    else:
        q_ref, pq_ref, k_ref, pk_ref, v_ref, kpad_ref, o_ref = refs
        rel_ref = None
    qi = pl.program_id(2)
    # block refs are H-squeezed: q [BC, bq, D], k/v [BC, S, D]
    S = k_ref.shape[1]
    if rel_ref is not None:
        # rel may arrive composed at a PADDED size [H, Tr≥T, Sr≥S] (the
        # encoder builds it at tile multiples); its row tiles share the q
        # tiling, and the lane tail is sliced off in VMEM — never a
        # materialized XLA slice copy
        rel = rel_ref[...][:, :S].astype(jnp.float32)  # [block_q, S]
    else:
        rel = None
    if causal:
        shape = (q_ref.shape[1], S)
        qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        cmask = kpos > qpos
    for c in range(block_b):
        w = jax.lax.dot_general(
            q_ref[c], k_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w += jax.lax.dot_general(
            pq_ref[c], pk_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rel is not None:
            w += rel
        if causal:
            w = jnp.where(cmask, NEG_INF, w)
        pad = kpad_ref[pl.program_id(0) * block_b + c, :] != 0
        w = jnp.where(pad[None, :], NEG_INF, w)
        # softmax math mirrors flash_attention_bwd._fwd_kernel exactly
        if skip_max:
            e = jnp.exp(w)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)
        else:
            m = jnp.max(w, axis=-1, keepdims=True)
            e = jnp.exp(w - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            e.astype(v_ref.dtype), v_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[c] = (acc / denom).astype(o_ref.dtype)


def flash_attention_inference(
    q: jnp.ndarray,       # [B, H, T, D] (pre-scaled)
    k: jnp.ndarray,       # [B, H, S, D]
    v: jnp.ndarray,       # [B, H, S, D]
    pos_q: jnp.ndarray,   # [B, H, T, D]
    pos_k: jnp.ndarray,   # [B, H, S, D]
    rel: jnp.ndarray | None,  # [H, T, S] additive bias, or None (cross attn)
    kpad: jnp.ndarray,    # [B, S] bool — True = masked key
    causal: bool = False,
    block_q: int = 128,
    interpret: bool = False,
    skip_max: bool = False,
    block_b: int = 4,
) -> jnp.ndarray:
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, T, D = q.shape
    S = k.shape[2]
    # batch chunk WITHOUT padding (padding the batch would reintroduce the
    # stream copies this kernel exists to remove)
    BC = next(c for c in (block_b, 2, 1) if B % c == 0)
    bq = min(block_q, _round_up(T, 8))
    grid = (B // BC, H, -(-T // bq))
    row4 = pl.BlockSpec((BC, None, bq, D), lambda b, h, i: (b, h, i, 0))
    full4 = pl.BlockSpec((BC, None, S, D), lambda b, h, i: (b, h, 0, 0))
    in_specs = [row4, row4, full4, full4, full4]
    args = [q, pos_q.astype(q.dtype), k, pos_k.astype(q.dtype), v]
    if rel is not None:
        # rel rides at its own (possibly padded) lane width Sr — full-dim
        # blocks satisfy Mosaic's divisibility rule; the kernel slices to S
        Sr = rel.shape[2]
        in_specs.append(pl.BlockSpec((None, bq, Sr), lambda b, h, i: (h, i, 0)))
        args.append(rel.astype(q.dtype))
    in_specs.append(pl.BlockSpec((B, S), lambda b, h, i: (0, 0)))
    args.append(kpad.astype(jnp.int32))
    return pl.pallas_call(
        functools.partial(
            _kernel, causal=causal, block_q=bq, block_b=BC,
            skip_max=skip_max, has_rel=rel is not None,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=row4,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=interpret,
    )(*args)
