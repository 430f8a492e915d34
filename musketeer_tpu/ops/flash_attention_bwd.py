"""Custom VJP for the Pallas attention-with-bias kernels (training path).

Standard flash-attention backward specialized to the block-parallel regime
(full K/V rows in VMEM, S ≤ ~1536). Forward additionally saves the per-row
log-sum-exp; backward recomputes P tile-wise and produces all six gradients:

  dW = P ∘ (dO·Vᵀ − rowsum(dO ∘ O))
  dq = dW·K         dpos_q = dW·PK
  dk = dWᵀ·Q        dpos_k = dWᵀ·PQ        dv = Pᵀ·dO
  drel = Σ_b dW

ONE batch-chunked kernel produces all six gradients, grid
(B/block_b, H, nQ); dsum = rowsum(dO ∘ O) is computed in-kernel from the
streamed dO/O tiles (as an XLA pass it is a minor-dim lane reduction,
~10× over roofline), and the packed/padded forward streams ride the VJP
residuals so no concat/pad pass re-runs in the backward. Each grid cell
loops ``block_b`` batch rows in-kernel, so
- dk/dv/dpos_k accumulate over the innermost q-tile axis (consecutive
  revisits of the same output block — the only legal Pallas accumulation),
- drel accumulates over the in-cell batch loop into a per-batch-chunk
  fp32 partial ([nBC, H, T, S]); the (usually trivial) cross-chunk sum
  happens in XLA.
An earlier revision used a second kernel with grid (H, nQ, B) to give drel
an innermost batch axis — that recomputed the whole [BQ, S] dW (the
VPU-bound exp pass) and re-streamed q/k/v/do a second time; the fused
version measured 1.6× faster at the encoder train shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e9

# Batch-chunk override for the backward kernel (None = the Sp-based policy
# in _bwd). Module-level so probes/benches can sweep it without re-plumbing
# the custom_vjp's static args.
BWD_BLOCK_B = None

# Forward batch-chunk override (None = the call-site default). The rel
# block is fetched once per batch chunk, so larger chunks amortize the
# [H, S, S] stream across more batch rows (VMEM-bound upper limit).
FWD_BLOCK_B = None

# Pure-inference programs run the unpacked/unpadded kernel
# (ops/flash_attention_infer.py) as the custom_vjp primal; False restores
# the packed+padded forward for A/B probes. Measured latency-neutral at the
# bench encoder shape (probe_infer_kernel.py: 56.2 ms both, tokens exact) —
# kept on for the HBM/odd-shape/zeros-rel benefits, not for speed.
INFER_UNPACKED = True

# Stream the forward's saved lse into the backward kernel (True) or
# recompute the softmax normalizer from the resident full-S row (False).
# The width-1 lse block is lane-padded to 128 → ~0.5 MB of double-buffered
# scoped VMEM; recomputing costs two extra [bq, S] reduces + one divide.
# MEASURED (probe_bb.py, B8 H12 S980): recompute is ~8% SLOWER (6.71 vs
# 6.18 ms at bq256/bb2) and the freed VMEM still does not let block_b=4
# compile — the extra VPU passes are a pure loss. Default stays True.
BWD_STREAM_LSE = True


def _round_up(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# forward kernel that also writes log-sum-exp
# ---------------------------------------------------------------------------

def _fwd_kernel(qc_ref, kc_ref, v_ref, rel_ref, kpad_ref,
                o_ref, lse_ref, *, causal, block_q, block_b,
                skip_max=False):
    # Two fusions over the naive layout:
    # - batch-chunked grid cell: refs carry ``block_b`` batch rows so the
    #   [block_q, S] rel block — identical for every batch element — is
    #   fetched once per chunk instead of once per element,
    # - content and positional projections ride PACKED along the head dim
    #   (qc = [q | pos_q], kc = [k | pos_k]): one dot computes
    #   q·kᵀ + pos_q·pos_kᵀ exactly. With hd=64 padded to the 128-lane
    #   tile anyway, this halves the QK MXU work and drops two of the
    #   seven input streams for free.
    qi = pl.program_id(2)
    rel = rel_ref[...].astype(jnp.float32)
    if causal:
        qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, rel.shape, 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, rel.shape, 1)
        rel = jnp.where(kpos > qpos, NEG_INF, rel)
    for c in range(block_b):
        w = jax.lax.dot_general(
            qc_ref[c], kc_ref[c], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w += rel
        # kpad rides as the full [B, S] array (a [block_b, S] block would
        # break Mosaic's sublane-multiple-of-8 rule); row-index it here
        pad = kpad_ref[pl.program_id(0) * block_b + c, :] != 0
        w = jnp.where(pad[None, :], NEG_INF, w)
        if skip_max:
            # numerics-gated fast softmax: drop the max-subtract pass (one
            # fewer full-width [bq, S] reduce + subtract on the VPU-bound
            # path). Safe while |logits| < ~80 (fp32 exp overflow at 88);
            # OFA's scaled logits sit well inside that — gated by
            # ModelConfig.flash_skip_max_subtract + a numerics test.
            # exp(NEG_INF pad cols) underflows to exactly 0.
            e = jnp.exp(w)
            # epsilon floor: fully-masked rows (batch-pad rows the backward
            # now REUSES instead of re-padding) would hit denom=0 → o=NaN,
            # lse=-inf → p=inf in the backward; the floor makes them o=0,
            # lse≈-87, p=exp(w−lse)=0 — exactly the zero rows bwd expects
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)
            lse_ref[c] = jnp.log(denom).astype(jnp.float32)
        else:
            m = jnp.max(w, axis=-1, keepdims=True)
            e = jnp.exp(w - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            lse_ref[c] = (m + jnp.log(denom)).astype(jnp.float32)
        # normalize AFTER the AV dot: the division runs over [bq, D]
        # instead of [bq, S] — one fewer full-width VPU pass (the kernel
        # is VPU-bound; the MXU dots are <40% of its wall time)
        acc = jax.lax.dot_general(
            e.astype(v_ref.dtype), v_ref[c], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[c] = (acc / denom).astype(o_ref.dtype)


def _bwd_kernel_fused(
    qc_ref, kc_ref, v_ref, rel_ref, kpad_ref,
    do_ref, *refs,
    causal, block_q, block_b, need_drel, stream_lse,
):
    if stream_lse:
        lse_ref, o_ref, dqc_ref, dkc_ref, dv_ref = refs[:5]
        maybe_drel = refs[5:]
    else:
        lse_ref = None
        o_ref, dqc_ref, dkc_ref, dv_ref = refs[:4]
        maybe_drel = refs[4:]
    drel_ref = maybe_drel[0] if need_drel else None
    # Packed layout mirrors the forward kernel: qc = [q | pos_q],
    # kc = [k | pos_k] along the head dim, so the w recompute is one dot
    # and the paired gradients come out packed for free:
    #   dW·kc  = [dq  | dpos_q]      dWᵀ·qc = [dk | dpos_k]
    qi = pl.program_id(2)
    rel = rel_ref[...].astype(jnp.float32)
    if causal:
        qpos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, rel.shape, 0)
        kpos = jax.lax.broadcasted_iota(jnp.int32, rel.shape, 1)
        rel = jnp.where(kpos > qpos, NEG_INF, rel)

    @pl.when(qi == 0)
    def _():
        dkc_ref[...] = jnp.zeros_like(dkc_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    drel_acc = jnp.zeros(rel.shape, jnp.float32) if need_drel else None
    for c in range(block_b):
        qc = qc_ref[c]
        kc = kc_ref[c]
        w = jax.lax.dot_general(
            qc, kc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w += rel
        pad = kpad_ref[pl.program_id(0) * block_b + c, :] != 0
        w = jnp.where(pad[None, :], NEG_INF, w)
        if stream_lse:
            p = jnp.exp(w - lse_ref[c])  # [BQ, S] fp32 (pad cols → 0)
        else:
            # recompute the normalizer from the resident full-S row. The
            # max clamp makes all-masked rows (batch/T-pad: every col
            # NEG_INF) give e = exp(-1e9+1e8) = 0 → p = 0 via the denom
            # floor — the same zero rows the streamed-lse path produces.
            m = jnp.maximum(jnp.max(w, axis=-1, keepdims=True), -1e8)
            e = jnp.exp(w - m)
            denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-38)
            p = e / denom

        do = do_ref[c].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v_ref[c].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dsum = rowsum(dO ∘ O) computed HERE over the VMEM-resident tiles:
        # as a standalone XLA pass it is a minor-dim (lane) reduction over
        # [B, H, T, D] — measured 1.6M cycles/layer in the compiled-HLO
        # ranking, ~10× over its HBM roofline
        ds = jnp.sum(do * o_ref[c].astype(jnp.float32), axis=-1, keepdims=True)
        dw = p * (dp - ds)  # [BQ, S]
        if need_drel:
            drel_acc += dw

        dqc_ref[c] = jax.lax.dot_general(
            dw, kc.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dqc_ref.dtype)
        dkc_ref[c] += jax.lax.dot_general(
            dw, qc.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dkc_ref.dtype)
        dv_ref[c] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
    if need_drel:
        drel_ref[...] = drel_acc.astype(drel_ref.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _pack_pad(q, k, v, pq, pk, rel, kpad, block_q):
    """Pack content|positional along the head dim (qc = [q|pos_q],
    kc = [k|pos_k]) and pad the SEQUENCE dims to tile multiples.

    The head dim stays unpadded on the v/o/do/dv streams: with hd=64 the
    packed qc/kc width is exactly the 128-lane tile, and Mosaic accepts a
    64-lane block when it covers the full minor dim — the earlier
    pad-D-to-128 layout doubled the v/o/do HBM streams and spent whole
    VPU passes on pad+slice copies (they ranked among the top fusions of
    the compiled encoder HLO).

    ``rel`` may arrive already padded to [H, Tp, Sp] (the encoder composes
    it at the padded size so XLA elides the pad entirely); pad widths are
    taken from its actual shape."""
    B, H, T, D = q.shape
    S = k.shape[2]
    Tp, Sp = _round_up(T, block_q), _round_up(S, 128)
    Dc = _round_up(2 * D, 128)
    qc = jnp.concatenate([q, pq], axis=-1)
    kc = jnp.concatenate([k, pk], axis=-1)
    qc = jnp.pad(qc, ((0, 0), (0, 0), (0, Tp - T), (0, Dc - 2 * D)))
    kc = jnp.pad(kc, ((0, 0), (0, 0), (0, Sp - S), (0, Dc - 2 * D)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    rel = jnp.pad(
        rel, ((0, 0), (0, Tp - rel.shape[1]), (0, Sp - rel.shape[2]))
    )
    kpad = jnp.pad(kpad, ((0, 0), (0, Sp - S)), constant_values=True)
    return qc, kc, v, rel, kpad, Tp, Sp, Dc


def _fwd(q, k, v, pq, pk, rel, kpad, causal, block_q, interpret, block_b=4,
         skip_max=False, want_res=False):
    interpret = interpret or jax.default_backend() == "cpu"
    if FWD_BLOCK_B is not None:
        block_b = FWD_BLOCK_B
    B, H, T, D = q.shape
    S = k.shape[2]
    qc, kc, v2, rel2, kpad2, Tp, Sp, Dc = _pack_pad(
        q, k, v, pq, pk, rel, kpad, block_q
    )
    BC = max(1, min(block_b, B))
    Bp = _round_up(B, BC)
    if Bp != B:
        bs = ((0, Bp - B), (0, 0), (0, 0), (0, 0))
        qc, kc = jnp.pad(qc, bs), jnp.pad(kc, bs)
        v2 = jnp.pad(v2, bs)
        kpad2 = jnp.pad(kpad2, ((0, Bp - B), (0, 0)), constant_values=True)
    grid = (Bp // BC, H, Tp // block_q)
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, causal=causal, block_q=block_q, block_b=BC,
            skip_max=skip_max,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BC, None, block_q, Dc), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((BC, None, Sp, Dc), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((BC, None, Sp, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, block_q, Sp), lambda b, h, i: (h, i, 0)),
            pl.BlockSpec((Bp, Sp), lambda b, h, i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((BC, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((BC, None, block_q, 1), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, H, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((Bp, H, Tp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qc, kc, v2, rel2, kpad2.astype(jnp.int32))
    if want_res:
        # hand the packed/padded streams + padded o/lse to the backward so
        # it re-runs NONE of the concat/pad passes (they ranked ~1.3M
        # cycles/layer in the compiled-HLO cycle ranking)
        return o[:B, :, :T], (qc, kc, v2, rel, kpad, o, lse)
    return o[:B, :, :T], lse[:B, :, :T, 0]


def _bwd(res, causal, block_q, interpret, need_drel, do, block_b=None,
         stream_lse=None):
    # Empirical scoped-VMEM limits (v5e, 16 MB): block_b=4 @ (bq128, S1024)
    # = 16.17 MB OOM; block_b=2 @ (bq256, S1152) = 19.15 MB OOM; block_b=2
    # fits at (bq256, S1024) and (bq128, S1152). Long-S pretrain pairs
    # (S≈1412→Sp1536) drop to block_b=1.
    #
    # ``res`` carries the forward's PACKED+PADDED streams (qc, kc, v2) and
    # padded o/lse, so no concat/pad pass re-runs here; only ``do`` (which
    # arrives unpadded from XLA) and the tiny rel/kpad pads are computed.
    qc2, kc2, v2, rel, kpad, o_p, lse_p = res
    interpret = interpret or jax.default_backend() == "cpu"
    B, H, T, D = do.shape
    S = kpad.shape[1]
    Bp_f, _, Tp, Dc = qc2.shape
    Sp = kc2.shape[2]
    rel2 = jnp.pad(
        rel, ((0, 0), (0, Tp - rel.shape[1]), (0, Sp - rel.shape[2]))
    )
    kpad2 = jnp.pad(kpad, ((0, 0), (0, Sp - S)), constant_values=True)
    do2 = jnp.pad(do, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))

    nq = Tp // block_q
    if block_b is None:
        block_b = BWD_BLOCK_B
    if block_b is None:
        block_b = 2 if Sp <= 1280 else 1
    # batch-chunk: padded batch rows carry kpad=True everywhere, so their
    # p = exp(NEG_INF − 0) = 0 and every gradient contribution vanishes
    BC = max(1, min(block_b, B))
    Bp = _round_up(B, BC)
    if Bp <= Bp_f:
        # forward rows past B are exactly the zero/kpad-True pad rows the
        # backward would build — slice instead of re-padding
        qc2, kc2, v2 = qc2[:Bp], kc2[:Bp], v2[:Bp]
        o_p, lse_p = o_p[:Bp], lse_p[:Bp]
    else:
        bs = ((0, Bp - Bp_f), (0, 0), (0, 0), (0, 0))
        qc2, kc2, v2 = jnp.pad(qc2, bs), jnp.pad(kc2, bs), jnp.pad(v2, bs)
        o_p, lse_p = jnp.pad(o_p, bs), jnp.pad(lse_p, bs)
    if Bp != B:
        do2 = jnp.pad(do2, ((0, Bp - B), (0, 0), (0, 0), (0, 0)))
        kpad2 = jnp.pad(kpad2, ((0, Bp - B), (0, 0)), constant_values=True)
    kpad_i = kpad2.astype(jnp.int32)
    nbc = Bp // BC
    if stream_lse is None:
        stream_lse = BWD_STREAM_LSE

    in_specs = [
        pl.BlockSpec((BC, None, block_q, Dc), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((BC, None, Sp, Dc), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((BC, None, Sp, D), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((None, block_q, Sp), lambda b, h, i: (h, i, 0)),
        pl.BlockSpec((Bp, Sp), lambda b, h, i: (0, 0)),
        pl.BlockSpec((BC, None, block_q, D), lambda b, h, i: (b, h, i, 0)),
    ]
    args = [qc2, kc2, v2, rel2, kpad_i, do2]
    if stream_lse:
        in_specs.append(
            pl.BlockSpec((BC, None, block_q, 1), lambda b, h, i: (b, h, i, 0)))
        args.append(lse_p)
    in_specs.append(
        pl.BlockSpec((BC, None, block_q, D), lambda b, h, i: (b, h, i, 0)))
    args.append(o_p)
    out_specs = [
        pl.BlockSpec((BC, None, block_q, Dc), lambda b, h, i: (b, h, i, 0)),
        pl.BlockSpec((BC, None, Sp, Dc), lambda b, h, i: (b, h, 0, 0)),
        pl.BlockSpec((BC, None, Sp, D), lambda b, h, i: (b, h, 0, 0)),
    ]
    out_shape = [
        # dqc is written ONCE per grid cell (no cross-revisit accumulation),
        # so it can come out in the input dtype directly — same final values
        # (the in-kernel dot still accumulates fp32; the cast happens once
        # either way), and the fp32→bf16 switch frees ~0.5 MB of scoped VMEM
        # per double-buffered block, which is what lets block_b=4 fit.
        jax.ShapeDtypeStruct((Bp, H, Tp, Dc), qc2.dtype),
        jax.ShapeDtypeStruct((Bp, H, Sp, Dc), jnp.float32),
        jax.ShapeDtypeStruct((Bp, H, Sp, D), jnp.float32),
    ]
    if need_drel:
        # per-batch-chunk partials in the REL dtype (bf16 on the TPU train
        # path): the in-kernel accumulate over block_b rows stays fp32; only
        # the per-chunk partial is rounded, and the final drel is cast to
        # rel.dtype anyway. fp32 partials were [nbc, H, Tp, Sp] ≈ 200 MB
        # write + re-read per encoder layer — the nbc-way sum ranked 1.6 M
        # cycles/layer in the compiled-HLO ranking; bf16 halves that traffic.
        out_specs.append(
            pl.BlockSpec((None, None, block_q, Sp), lambda b, h, i: (b, h, i, 0))
        )
        out_shape.append(
            jax.ShapeDtypeStruct((nbc, H, Tp, Sp), rel.dtype)
        )
    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel_fused, causal=causal, block_q=block_q,
            block_b=BC, need_drel=need_drel, stream_lse=stream_lse,
        ),
        grid=(nbc, H, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    if need_drel:
        dqc, dkc, dv, drel_p = outs
        # slice to the INPUT rel's shape (it may arrive pre-padded to
        # [H, Tp, Sp]; the vjp must return a matching-shape cotangent);
        # fp32 ACCUMULATION dtype on the reduce itself — a separate
        # .astype(f32) can materialize a full fp32 copy of the partials
        # (+200 MB/layer temp at the encoder shape)
        drel = jnp.sum(drel_p, axis=0, dtype=jnp.float32)[
            :, : rel.shape[1], : rel.shape[2]
        ].astype(rel.dtype)
    else:
        dqc, dkc, dv = outs
        drel = jnp.zeros_like(rel)

    qsl = (slice(0, B), slice(None), slice(0, T))
    ksl = (slice(0, B), slice(None), slice(0, S))
    qkdt = qc2.dtype
    return (
        dqc[qsl + (slice(0, D),)].astype(qkdt),
        dkc[ksl + (slice(0, D),)].astype(qkdt),
        dv[ksl].astype(v2.dtype),
        dqc[qsl + (slice(D, 2 * D),)].astype(qkdt),
        dkc[ksl + (slice(D, 2 * D),)].astype(qkdt),
        drel,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def flash_attention_bias_trainable(
    q, k, v, pos_q, pos_k, rel, kpad,
    causal: bool = False, block_q: int = 128, interpret: bool = False,
    need_drel: bool = True, skip_max: bool = False,
):
    """Differentiable Pallas attention with decomposed bias.

    Supports self (T==S, optional causal) and cross (T != S, rel usually
    zeros with need_drel=False) attention. ``skip_max`` drops the softmax
    max-subtract pass (numerics-gated; see _fwd_kernel).

    The PRIMAL (this body — what pure-inference programs execute) runs the
    unpacked/unpadded kernel (ops/flash_attention_infer.py): no pack/pad
    stream copies, native odd shapes. Differentiated programs trace
    ``_vjp_fwd`` instead, which keeps the packed+padded forward whose
    streams ride the residuals into the fused backward. ``need_drel=False``
    doubles as the static "rel is zeros" promise (true at both model call
    sites: cross attention passes a zeros rel), letting the inference
    kernel skip the [H, T, S] rel stream read entirely."""
    if INFER_UNPACKED:
        from .flash_attention_infer import flash_attention_inference

        return flash_attention_inference(
            q, k, v, pos_q, pos_k, rel if need_drel else None, kpad,
            causal=causal, block_q=block_q, interpret=interpret,
            skip_max=skip_max,
        )
    o, _ = _fwd(
        q, k, v, pos_q, pos_k, rel, kpad, causal, block_q, interpret,
        skip_max=skip_max,
    )
    return o


def _vjp_fwd(q, k, v, pos_q, pos_k, rel, kpad, causal, block_q, interpret,
             need_drel, skip_max):
    return _fwd(
        q, k, v, pos_q, pos_k, rel, kpad, causal, block_q, interpret,
        skip_max=skip_max, want_res=True,
    )


def _vjp_bwd(causal, block_q, interpret, need_drel, skip_max, res, do):
    # lse is the same mathematical value either way; the backward recompute
    # p = exp(w − lse) never overflows, so it is skip_max-agnostic
    dq, dk, dv, dpq, dpk, drel = _bwd(
        res, causal, block_q, interpret, need_drel, do,
    )
    return dq, dk, dv, dpq, dpk, drel, None


flash_attention_bias_trainable.defvjp(_vjp_fwd, _vjp_bwd)
