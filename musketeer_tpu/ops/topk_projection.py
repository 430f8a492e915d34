"""Fused output-projection + softmax-stats kernel for the decode loop.

The incremental decode step is dominated by the [Vp, d] tied-embedding
projection and the full-vocab beam bookkeeping that follows it. Measured on
v5e (BENCH r3 probes): ANY XLA op over the [B·K, 59520] logits costs
~0.6-0.8 ms — lane-axis reductions and top-k run ~30x off the HBM roofline
— so the r2 beam logic paid ~0.8 ms/step and a candidate-domain redesign
that split logsumexp from a top-M made it WORSE (1.4 ms; top-k cost grows
with k). Ref hot path: models/sequence_generator.py:803-900.

This kernel computes, in ONE pass over the projection weights:
  - logits [N, Vp] (bf16, written once),
  - per-128-token-block maxes [N, Vp/128],
  - per-tile partial softmax stats (max + sumexp) [N, ntiles] for an exact
    logsumexp,
with the elementwise work done in VMEM at compute speed. The beam step then
selects candidate BLOCKS from the tiny [N, Vp/128] block-max table and
gathers ≤ a few thousand logits — no full-vocab XLA pass survives.

Supports the int8 serving projection (per-row absmax scales): the int8→bf16
convert happens in VMEM inside the kernel, which XLA refused to fuse at the
HLO level (the r2 int8-KV negative result), so int8 halves the only real
HBM traffic left (the weight read).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9
BLK = 128  # block-max granularity (one lane row)


def _proj_body(i, logits, logits_ref, bmax_ref, m_ref, s_ref, tile_v,
               vocab_size):
    """Shared tail: mask padding, write logits + stats.

    Output layouts are [ntiles, N, ...] (block = one i-slice) — Mosaic
    requires the last two block dims divisible by (8, 128) or equal to the
    array dims, and Vp/128 = 465 is odd, so a [N, Vp/128] block-max layout
    admits no legal tiling; the [ntiles, N, tile_blocks] layout does
    (N % 8 == 0 via padding upstream; tile_blocks == full last dim).
    """
    gidx = i * tile_v + jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(gidx >= vocab_size, NEG_INF, logits)
    logits_ref[...] = logits.astype(logits_ref.dtype)
    N = logits.shape[0]
    bmax_ref[0] = jnp.max(
        logits.reshape(N, tile_v // BLK, BLK), axis=-1
    ).astype(bmax_ref.dtype)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m_ref[0] = m
    s_ref[0] = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)


def _proj_kernel(h_ref, w_ref, logits_ref, bmax_ref, m_ref, s_ref,
                 *, tile_v, vocab_size):
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [N, tile_v]
    _proj_body(pl.program_id(0), logits, logits_ref, bmax_ref, m_ref, s_ref,
               tile_v, vocab_size)


def _proj_kernel_q8(h_ref, w_ref, scale_ref, logits_ref, bmax_ref, m_ref,
                    s_ref, *, tile_v, vocab_size):
    h = h_ref[...]
    w = w_ref[...].astype(h.dtype)  # int8 → bf16 IN VMEM (the fusion XLA
    # wouldn't do: weights stream from HBM as int8, half the traffic)
    logits = jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits * scale_ref[...][:, 0][None, :]
    _proj_body(pl.program_id(0), logits, logits_ref, bmax_ref, m_ref, s_ref,
               tile_v, vocab_size)


def _pick_tile(Vp: int, cap: int = 4096) -> int:
    """Largest multiple of BLK that divides Vp and is ≤ cap."""
    best = BLK
    t = BLK
    while t <= cap:
        if Vp % t == 0:
            best = t
        t += BLK
    return best


def project_with_stats(
    features: jnp.ndarray,  # [N, D] (post-LN decoder features, pre-scaled)
    w: jnp.ndarray,  # [Vp, D] bf16/fp32 or int8
    w_scale: Optional[jnp.ndarray] = None,  # [Vp] fp32 (int8 dequant)
    vocab_size: Optional[int] = None,  # real vocab (< Vp when padded)
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """→ (logits [N, Vp] bf16, block_max [N, Vp/BLK] fp32, Z [N] fp32).

    Z is the exact log-sum-exp of each row (padding columns masked to
    NEG_INF inside the kernel). Requires Vp % 128 == 0 (the OFA layout
    pads the vocab to 59520 = 465·128 for exactly this reason).
    """
    interpret = interpret or jax.default_backend() == "cpu"
    Nr, D = features.shape
    # pad rows to a sublane multiple (Mosaic block rule); padded rows are
    # sliced off before returning
    N = -(-Nr // 8) * 8
    if N != Nr:
        features = jnp.pad(features, ((0, N - Nr), (0, 0)))
    Vp = w.shape[0]
    assert Vp % BLK == 0, f"padded vocab {Vp} not a multiple of {BLK}"
    vs = vocab_size if vocab_size is not None else Vp
    # scoped-VMEM-aware vocab tile: the double-buffered weight block is
    # [tile_v, D] — tile 4096 fits at D=768 (ofa_base, the tuned config)
    # but OOMs the 16 MB scoped VMEM at D=1024 (ofa_large: 16.71 MB
    # compile error). 59520 = 128·3·5·31, so the next tile down that
    # divides Vp is 1920 (=128·15) — comfortable for d=1024/1280.
    tile_v = _pick_tile(Vp, cap=4096 if D <= 768 else 1920)
    ntiles = Vp // tile_v
    tpb = tile_v // BLK  # blocks per tile

    q8 = w.dtype == jnp.int8
    out_dtype = features.dtype
    out_shape = [
        jax.ShapeDtypeStruct((N, Vp), out_dtype),  # logits
        jax.ShapeDtypeStruct((ntiles, N, tpb), jnp.float32),  # block maxes
        jax.ShapeDtypeStruct((ntiles, N, 1), jnp.float32),  # partial max
        jax.ShapeDtypeStruct((ntiles, N, 1), jnp.float32),  # partial sumexp
    ]
    out_specs = [
        pl.BlockSpec((N, tile_v), lambda i: (0, i)),
        pl.BlockSpec((1, N, tpb), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, N, 1), lambda i: (i, 0, 0)),
    ]
    in_specs = [
        pl.BlockSpec((N, D), lambda i: (0, 0)),
        pl.BlockSpec((tile_v, D), lambda i: (i, 0)),
    ]
    args = [features, w]
    if q8:
        assert w_scale is not None
        in_specs.append(pl.BlockSpec((tile_v, 1), lambda i: (i, 0)))
        args.append(w_scale.reshape(Vp, 1).astype(jnp.float32))
        kern = functools.partial(
            _proj_kernel_q8, tile_v=tile_v, vocab_size=vs
        )
    else:
        kern = functools.partial(_proj_kernel, tile_v=tile_v, vocab_size=vs)

    logits, bmax_t, mpart, spart = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    # tiny reshapes: [ntiles, N, tpb] → [N, Vp/BLK]; stats → [N, ntiles]
    bmax = bmax_t.transpose(1, 0, 2).reshape(N, Vp // BLK)
    mpart = mpart[:, :, 0].T
    spart = spart[:, :, 0].T
    # exact logsumexp from the per-tile stats ([N, ntiles] — tiny)
    mstar = jnp.max(mpart, axis=1)
    Z = mstar + jnp.log(
        jnp.sum(spart * jnp.exp(mpart - mstar[:, None]), axis=1)
    )
    return logits[:Nr], bmax[:Nr], Z[:Nr]


def select_candidate_blocks(
    logits: jnp.ndarray,  # [N, Vp] (kernel output)
    bmax: jnp.ndarray,  # [N, Vp/BLK]
    nb_sel: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``nb_sel`` 128-token blocks per row → (values [N, nb_sel·BLK],
    token ids [N, nb_sel·BLK]).

    Exactness: the post-ban top-2K tokens of a row live within its top
    ``2K + max_bans`` blocks (every block outranking token t's block holds
    a token better than t — at most 2K−1 unbanned ones plus one block per
    banned token). On exact value ties at the selection boundary a
    different equal-scoring token may be chosen (bf16 logits collide); the
    reference's torch.topk tie order is its own implementation detail.
    """
    N, Vp = logits.shape
    _, bidx = jax.lax.top_k(bmax, nb_sel)  # [N, nb_sel]
    blk = logits.reshape(N, Vp // BLK, BLK)
    g = jnp.take_along_axis(blk, bidx[:, :, None], axis=1)
    ids = bidx[:, :, None] * BLK + jnp.arange(BLK)[None, None, :]
    return g.reshape(N, nb_sel * BLK), ids.reshape(N, nb_sel * BLK)
