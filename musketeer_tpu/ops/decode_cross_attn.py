"""Fused int8 cross-KV attention for the incremental decode step.

The serving option `quantize_cross_kv` (models/ofa.py) halves the
cross-attention cache footprint, but the XLA decode path materializes the
int8→bf16 convert of the whole [B, H, S, D] cache every step (measured ~6%
slower end-to-end than the bf16 cache on v5e — BENCH r2 negative result).
This kernel reads the int8 cache directly from HBM and dequantizes
per-tile in VMEM, so the int8 format's 2× traffic saving actually lands on
the decode loop's dominant stream (ref hot path:
models/sequence_generator.py:803-900 step loop; the reference never
quantizes its cache — this is a TPU-serving extension).

Math (identical to the XLA path in models/ofa.py:1128-1155):
  w    = (q·k_i8ᵀ)·k_scale + bias       (scales factor out of the dot)
  p    = softmax(w over S, pad → 0)
  out  = (p·v_scale)·v_i8

Per grid cell (one batch sample) the full [H, S, D] K/V caches sit in VMEM
(~1.5 MB int8 each at S=1024/H=12) and the H heads run as one batched dot,
so the kernel launches B cells instead of B·H tiny ones; beams ride as Kb
query rows so the per-sample cache is fetched once for all beams.
Fully-padded batch rows produce exact zero outputs via the clamped max +
denom floor (same trick as the train kernel), matching the XLA path's
NaN-guarded zeros.

MEASURED NEGATIVE (probe_int8kv.py, v5e, B16/beam5/S≈980, r3), both
layouts: grid B×H per-head cells decoded at 53.3 ms; the H-batched
variant below (grid B, one batched dot over all 12 heads, 12× fewer
cells) at 47.3 ms — vs 31.6 ms for the XLA int8 einsum path and 27.3 ms
for the bf16 cache. Token-exact in both cases. The per-step work
(~120 MFLOP across 12 layer launches inside the while loop) is too small
to amortize the pallas_call fixed cost; XLA's fused einsum keeps the
whole step in one program. The kernel stays tested + documented but NOT
wired: `decode_int8_kv_kernel` defaults to False. int8 cross-KV remains
a memory-footprint option, ~15% slower decode than bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, bias_ref, pad_ref, o_ref):
    # blocks: q [H, Kb, D]; k/v [H, S, D] int8; ks/vs/bias [H, 1, S];
    # pad [B, S] (full array, indexed by program_id)
    q = q_ref[...]
    kf = k_ref[...].astype(q.dtype)
    w = jax.lax.dot_general(
        q, kf, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [H, Kb, S]
    w = w * ks_ref[...] + bias_ref[...].astype(jnp.float32)
    pad = pad_ref[pl.program_id(0), :] != 0
    w = jnp.where(pad[None, None, :], NEG_INF, w)
    # clamped max: all-masked rows give e = exp(-1e9 + 1e8) = 0 → p = 0
    # via the denom floor (exact zero rows, like the XLA NaN guard)
    m = jnp.maximum(jnp.max(w, axis=-1, keepdims=True), -1e8)
    e = jnp.exp(w - m)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)
    p = (e / denom) * vs_ref[...]
    o_ref[...] = jax.lax.dot_general(
        p.astype(q.dtype), v_ref[...].astype(q.dtype),
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def decode_cross_attention_int8(
    q: jnp.ndarray,        # [B, H, Kb, D] (pre-scaled, compute dtype)
    k_i8: jnp.ndarray,     # [B, H, S, D] int8
    v_i8: jnp.ndarray,     # [B, H, S, D] int8
    k_scale: jnp.ndarray,  # [B, H, S] f32
    v_scale: jnp.ndarray,  # [B, H, S] f32
    bias: jnp.ndarray,     # [B, H, S] this step's cross-pos bias row
    enc_pad: jnp.ndarray,  # [B, S] bool
    interpret: bool = False,
) -> jnp.ndarray:
    """One decode step of beam-shared cross attention on an int8 KV cache.

    q rides H-major ([B, H, Kb, D]) so every block spec keeps its squeezed
    axes leading — Mosaic's (8, 128) rule reads the block's LAST two dims,
    and Kb/D (resp. 1/S) are full-dim there. Returns [B, H, Kb, D] in q's
    dtype."""
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, Kb, D = q.shape
    S = k_i8.shape[2]
    # scales/bias ride as [B, H, 1, S]: the trailing (1, S) block keeps the
    # sublane slot full-dim
    row = lambda a: a.reshape(B, H, 1, S)
    row_spec = pl.BlockSpec((None, H, 1, S), lambda b: (b, 0, 0, 0))
    return pl.pallas_call(
        _kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, Kb, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, S, D), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((None, H, S, D), lambda b: (b, 0, 0, 0)),
            row_spec, row_spec, row_spec,
            pl.BlockSpec((B, S), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, Kb, D), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Kb, D), q.dtype),
        interpret=interpret,
    )(q, k_i8, v_i8, row(k_scale), row(v_scale), row(bias),
      enc_pad.astype(jnp.int32))
