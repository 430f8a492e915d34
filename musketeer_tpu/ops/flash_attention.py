"""Pallas TPU attention with decomposed additive positional bias.

The reference's hot spot is materializing per-layer [B, H, S, S] bias
(abs-pos q·k + relative-bucket gathers) and full attention weights in HBM
(ref: unify_transformer.py:922-933, unify_multihead_attention.py:365-390).
This kernel removes both:

- the abs-pos bias is COMPUTED on the MXU inside the kernel as a second
  qk-product (pos_q @ pos_kᵀ) — never materialized,
- the relative-bucket bias is batch-invariant, so it streams as one
  [H, S, S] bf16 tensor shared across the whole batch (B× traffic saving),
- attention weights live only in VMEM tiles; softmax is fused.

Shape contract (all padded to multiples of the tile sizes by the wrapper):
  q, k, v:      [B, H, S, D]
  pos_q, pos_k: [B, H, S, D]   (abs-pos projections, pre-scaled)
  rel:          [H, S, S]      (per-layer relative bias, or zeros)
  kpad:         [B, S] bool    (True = padded key)

Per (b, h, q-tile) grid cell the full K/V rows are resident in VMEM —
'block-parallel' attention, the right regime for OFA's S ≤ ~1536 (900 image
patches + 512 text tokens); a streaming online-softmax variant only wins for
much longer sequences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, pq_ref, pk_ref, rel_ref, kpad_ref, o_ref):
    # blocks: q/pq [BQ, D]; k/v/pk [S, D]; rel [BQ, S]; kpad [1, S]; o [BQ, D]
    q = q_ref[...]
    k = k_ref[...]
    w = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, S]
    pq = pq_ref[...]
    pk = pk_ref[...]
    w += jax.lax.dot_general(
        pq, pk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    w += rel_ref[...].astype(jnp.float32)
    pad = kpad_ref[pl.program_id(0), :] != 0  # [S]
    w = jnp.where(pad[None, :], NEG_INF, w)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    e = jnp.exp(w)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _causal_attn_kernel(
    q_ref, k_ref, v_ref, pq_ref, pk_ref, rel_ref, kpad_ref, o_ref, *, block_q
):
    qi = pl.program_id(2)
    q = q_ref[...]
    k = k_ref[...]
    w = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    w += jax.lax.dot_general(
        pq_ref[...], pk_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w += rel_ref[...].astype(jnp.float32)
    S = w.shape[1]
    qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)
    w = jnp.where(kpos > qpos, NEG_INF, w)
    pad = kpad_ref[pl.program_id(0), :] != 0
    w = jnp.where(pad[None, :], NEG_INF, w)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    e = jnp.exp(w)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attn_kernel_norel(q_ref, k_ref, v_ref, pq_ref, pk_ref, kpad_ref, o_ref):
    """Cross-attention variant: abs-pos bias only (no relative tensor)."""
    w = jax.lax.dot_general(
        q_ref[...], k_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w += jax.lax.dot_general(
        pq_ref[...], pk_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = jnp.where((kpad_ref[pl.program_id(0), :] != 0)[None, :], NEG_INF, w)
    w = w - jnp.max(w, axis=-1, keepdims=True)
    e = jnp.exp(w)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v_ref.dtype)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


def flash_cross_attention(
    q: jnp.ndarray,  # [B, H, T, D] (already scaled)
    k: jnp.ndarray,  # [B, H, S, D]
    v: jnp.ndarray,
    pos_q: jnp.ndarray,  # [B, H, T, D] (pos-scaled)
    pos_k: jnp.ndarray,  # [B, H, S, D]
    kpad: jnp.ndarray,  # [B, S]
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp, Sp, Dp = _round_up(T, block_q), _round_up(S, 128), _round_up(D, 128)
    qpad = ((0, 0), (0, 0), (0, Tp - T), (0, Dp - D))
    kpad_spec = ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D))
    q = jnp.pad(q, qpad)
    pos_q = jnp.pad(pos_q, qpad)
    k = jnp.pad(k, kpad_spec)
    v = jnp.pad(v, kpad_spec)
    pos_k = jnp.pad(pos_k, kpad_spec)
    kpad = jnp.pad(kpad, ((0, 0), (0, Sp - S)), constant_values=True)
    out = pl.pallas_call(
        _attn_kernel_norel,
        grid=(B, H, Tp // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((B, Sp), lambda b, h, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        interpret=interpret,
    )(q, k, v, pos_q, pos_k, kpad.astype(jnp.int32))
    return out[:, :, :T, :D]


def flash_attention_bias(
    q: jnp.ndarray,  # [B, H, S, D] (already scaled)
    k: jnp.ndarray,
    v: jnp.ndarray,
    pos_q: jnp.ndarray,  # [B, H, S, D] (already pos-scaled)
    pos_k: jnp.ndarray,
    rel: jnp.ndarray,  # [H, S, S]
    kpad: jnp.ndarray,  # [B, S] bool
    causal: bool = False,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, S, D = q.shape
    Sp = _round_up(S, block_q)
    Dp = _round_up(D, 128)
    if Sp != S or Dp != D:
        padspec = ((0, 0), (0, 0), (0, Sp - S), (0, Dp - D))
        q = jnp.pad(q, padspec)
        k = jnp.pad(k, padspec)
        v = jnp.pad(v, padspec)
        pos_q = jnp.pad(pos_q, padspec)
        pos_k = jnp.pad(pos_k, padspec)
        rel = jnp.pad(rel, ((0, 0), (0, Sp - S), (0, Sp - S)))
        kpad = jnp.pad(kpad, ((0, 0), (0, Sp - S)), constant_values=True)

    grid = (B, H, Sp // block_q)
    kernel = (
        functools.partial(_causal_attn_kernel, block_q=block_q)
        if causal
        else _attn_kernel
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, Sp, Dp), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, block_q, Sp), lambda b, h, i: (h, i, 0)),
            pl.BlockSpec((B, Sp), lambda b, h, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (None, None, block_q, Dp), lambda b, h, i: (b, h, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Sp, Dp), q.dtype),
        interpret=interpret,
    )(
        q, k, v, pos_q, pos_k, rel, kpad.astype(jnp.int32)
    )
    return out[:, :, :S, :D]


def attention_reference(q, k, v, pos_q, pos_k, rel, kpad, causal=False):
    """XLA reference for numerics tests (same math, materialized bias)."""
    w = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w += jnp.einsum(
        "bhqd,bhkd->bhqk", pos_q, pos_k, preferred_element_type=jnp.float32
    )
    w += rel[None].astype(jnp.float32)
    if causal:
        S = q.shape[2]
        qpos = jnp.arange(S)[:, None]
        kpos = jnp.arange(S)[None, :]
        w = jnp.where(kpos > qpos, NEG_INF, w)
    w = jnp.where(kpad[:, None, None, :], NEG_INF, w)
    p = jax.nn.softmax(w, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)
