"""Single-launch fused decoder-stack kernel for the incremental decode step.

STATUS: measured NEGATIVE on-chip (round 5) — kept tested but OFF by
default. VERDICT r4 #4 hypothesized the per-step decoder stack (~0.85 ms
at the bench envelope: B16, beam5, ofa_base) could approach its ~0.45 ms
HBM roofline by fusing all L layers into one pallas_call. Three design
iterations later the best variant measures 1.80 ms/step decode vs the
XLA scan's 1.62 (speedup 0.968x, full program 89.4 vs 86.5 ms): XLA
already overlaps the cross-KV HBM stream with compute near-optimally,
and Mosaic's no-lane-split rule (d <-> H x hd is an "unsupported shape
cast") forces per-head loop decompositions whose VPU + instruction
overhead exceeds whatever scheduling slack the fusion recovers. An
earlier block-diagonal chunked variant (4x redundant lane-reduction
softmax work) measured 2.75 ms/step — full-vocab-style lane reductions
dominate, consistent with the r3 finding that any op on a wide lane
axis runs ~30x off roofline.

Design (the surviving variant):
  * grid=(L,): per-layer weight blocks ride the normal block pipeline
    (Mosaic prefetches layer l+1's weights during layer l's compute);
  * the hidden state x [rows, d] lives in VMEM scratch across grid
    steps (TPU grid cells execute sequentially, scratch persists);
  * cross-K/V stream from HBM per SAMPLE via manually rotated
    make_async_copy DMAs (4 slots), pre-transposed once per decode
    session to [L*B, H, hd, S'] with S' padded to a 128 multiple —
    tpu.memref_slice miscompiles on 64-lane-minor HBM refs and requires
    128-aligned slices, so S rides the lanes;
  * per sample: ONE head-batched score dot [H, K, hd] x [H, hd, S'] ->
    softmax -> value dot, heads staged into a [rows, d] scratch and
    folded by one full-width out-proj matmul (exactly the XLA shape);
  * the new self-K/V column is emitted per layer ([L, rows, d]) and the
    caller does one dynamic_update_slice into the stacked cache — the
    kernel reads the (stale-zero) cache block and substitutes the
    current position's score in-register, so the cache is read-only
    inside the kernel.

Numerics match the XLA path in models/ofa.py::_decoder_layer (incremental
branch) op for op: LN/softmax in fp32, dots accumulate fp32 and round to
bf16 before bias adds, probs cast to compute dtype before the value dot,
erf-gelu (restated from XLA's erfc expansion — Mosaic has no erf/erfc
rule; the restatement is bit-exact vs jax.nn.gelu over all 65536 bf16
inputs when lowered by XLA). Key padding uses a prefolded -1e9 bias:
identical probabilities whenever a sample has >=1 valid key — always
true for encoder output. Residual ~1-ulp divergences (Mosaic exp in the
erfc tail branch, f32 addition order in the per-head self out-proj
partials) make long generations drift off the XLA path's sampled
tokens, which the CPU-interpret parity tests (tolerance 2e-4) cannot
see — acceptable for an off-by-default kernel, but another reason it is
not wired on.

Preconditions (caller falls back to the XLA scan otherwise): no decoder
prompts, no int8 cross-KV, no normformer extras (scale_attn / scale_fc /
scale_heads / scale_resids all False), rows = B*K, B even, S % 8 == 0
and S >= 128 on TPU (the generation path pads the cross cache at init
when the kernel is enabled).

Ref hot loop being replaced: models/sequence_generator.py:351-363 (the
reference calls the full torch decoder per step); SURVEY §3.1.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


# XLA's f32 erfc expansion (TPU HLO dump of lax.erfc, 2026-08; cephes
# rational forms). Mosaic has no erf/erfc lowering rule, so the kernel
# restates the expansion op-for-op: the |x|<1 branch (pure polynomial)
# is bit-identical to the XLA path; the |x|>=1 branch goes through exp,
# whose Mosaic rounding may differ from XLA's by ~1 ulp on an erfc value
# that is itself <= erfc(1) = 0.157 — immaterial after the bf16 round.
_ERF_P = (7.85386146e-05, -0.000801019371, 0.00518832775, -0.0268538129,
          0.112835854, -0.37612626, 1.12837911)
_ERFC_P = (0.0232682, -0.138703942, 0.368742466, -0.582473278, 0.621000469,
           -0.494451523, 0.340488, -0.274112701, 0.563825965)
_ERFC_R = (-10.477664, 12.9772, -7.49551868, 2.92101908, -1.01526523,
           0.42184633, -0.282076746, 0.564189494)


def _horner(x, coeffs):
    acc = x * jnp.float32(coeffs[0])
    for c in coeffs[1:-1]:
        acc = (acc + jnp.float32(c)) * x
    return acc + jnp.float32(coeffs[-1])


def _erfc_f32(x):
    """lax.erfc restated from its XLA f32 expansion (see above)."""
    ax = jnp.abs(x)
    x2 = x * x
    res_a = jnp.float32(1.0) - x * _horner(x2, _ERF_P)
    q = jnp.float32(1.0) / x2
    z = jnp.exp(-x2) * (jnp.float32(1.0) / ax)
    pick = jnp.where(ax < 2.0, _horner(q, _ERFC_P), _horner(q, _ERFC_R))
    e = jnp.where(-x2 < -88.7228394, jnp.float32(0.0), z * pick)
    res_b = jnp.where(x < 0.0, jnp.float32(2.0) - e, e)
    return jnp.where(ax < 1.0, res_a, res_b)


def _gelu_exact(h):
    """jax.nn.gelu(approximate=False) restated: 0.5*h*erfc(-h*sqrt_half),
    with the -h*sqrt_half product in the compute dtype and the erfc in
    fp32, matching the XLA path's promotion order."""
    y = (-h) * jnp.asarray(0.7071067811865476, h.dtype)
    e = _erfc_f32(y.astype(jnp.float32)).astype(h.dtype)
    return (h * jnp.asarray(0.5, h.dtype)) * e


def _ln(x, scale, bias):
    """fp32 layer norm matching models.ofa._layer_norm (eps 1e-5)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias
    return out.astype(x.dtype)


def _dot(a, b):
    """a @ b with fp32 accumulation, rounded to a.dtype (XLA matmul parity)."""
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)


def _kernel(
    # scalar prefetch
    idx_ref,  # [1] int32: cache write position (== step, no prompts)
    # inputs (blocked per layer unless noted)
    x0_ref,  # [rows, d] whole
    w_self3_ref,  # (1, d, 3d) fused q|k|v
    b_self3_ref,  # (1, 1, 3d)
    w_so_ref,  # (1, d, d) self out_proj
    w_cq_ref,  # (1, d, d) cross q_proj
    w_co_ref,  # (1, d, d) cross out_proj
    w_fc1_ref,  # (1, d, f)
    b_fc1_ref,  # (1, 1, f)
    w_fc2_ref,  # (1, f, d)
    b_misc_ref,  # (1, 4, d): [self_o_b, cross_q_b, cross_o_b, fc2_b]
    ln_ref,  # (1, 6, d) fp32: sa_s, sa_b, ca_s, ca_b, fl_s, fl_b
    sbias_ref,  # (1, H, rows, Tmax) fp32: self_bias_t + rel_t, head-major
    cbias_ref,  # [B, H, S] fp32 whole (pad already folded to -1e9)
    selfk_ref,  # (1, rows, H, Tmax, hd)
    selfv_ref,  # (1, rows, H, Tmax, hd)
    crossk_hbm,  # [L*B, H, hd, S] ANY (keys pre-transposed, S-minor)
    crossv_hbm,  # [L*B, H, hd, S] ANY (values pre-transposed)
    # outputs
    xout_ref,  # [rows, d] whole
    knew_ref,  # (1, rows, d)
    vnew_ref,  # (1, rows, d)
    # scratch
    x_s,  # [rows, d] residual stream, persists across grid steps
    out_s,  # [rows, d] cross-attn head-major staging
    kbuf,  # [NSLOTS, 1, H, hd, S]
    vbuf,  # [NSLOTS, 1, H, hd, S]
    ksem,
    vsem,
    *,
    L: int,
    B: int,
    K: int,
    H: int,
    hd: int,
    nslots: int,
    scaling: float,
):
    l = pl.program_id(0)
    idx = idx_ref[0]
    d = H * hd

    # Cross-K/V streams per SAMPLE via manually rotated make_async_copy
    # DMAs (nslots-deep). The HBM side is [L*B, H, hd, S]: the leading
    # dims are premerged (5D refs with a dynamic index miscompile) and
    # the minor dim is S >= 128 (tpu.memref_slice miscompiles on
    # 64-lane-minor tiled HBM refs — hd can't ride the lanes).
    def kdma(slot, layer, bb):
        sl = pl.ds(layer * B + bb, 1)
        return pltpu.make_async_copy(
            crossk_hbm.at[sl], kbuf.at[slot], ksem.at[slot]
        )

    def vdma(slot, layer, bb):
        sl = pl.ds(layer * B + bb, 1)
        return pltpu.make_async_copy(
            crossv_hbm.at[sl], vbuf.at[slot], vsem.at[slot]
        )

    @pl.when(l == 0)
    def _():
        x_s[...] = x0_ref[...]
        # fill all but one slot for layer 0 (later layers: the tail of
        # layer l-1's sample loop prefetches them)
        for bb in range(min(nslots - 1, B)):
            kdma(bb, 0, bb).start()
            vdma(bb, 0, bb).start()

    ln = ln_ref[0]
    x = x_s[...]

    # Mosaic cannot split/merge the LANE dim (d <-> H x hd: "unsupported
    # shape cast"), so head decompositions below use lane SLICES at hd
    # offsets plus per-head loops — all verified-supported ops. The
    # partial self out-proj dots accumulate in f32 and round once,
    # matching the XLA path's single f32-accumulated matmul up to f32
    # addition order.
    # ---- self attention over the growing cache -------------------------
    h = _ln(x, ln[0], ln[1])
    qkv = _dot(h, w_self3_ref[0]) + b_self3_ref[0, 0]
    k_new = qkv[:, d : 2 * d]
    v_new = qkv[:, 2 * d :]
    knew_ref[0] = k_new
    vnew_ref[0] = v_new

    acc = None
    for hh in range(H):
        sl = slice(hh * hd, (hh + 1) * hd)
        qf = (qkv[:, sl] * scaling).astype(jnp.float32)  # [rows, hd]
        kc = selfk_ref[0][:, hh].astype(jnp.float32)  # [rows, Tmax, hd]
        w_cache = jnp.sum(qf[:, None, :] * kc, axis=-1)  # [rows, Tmax]
        w_cur = jnp.sum(qf * k_new[:, sl].astype(jnp.float32), axis=-1)
        t_iota = jax.lax.broadcasted_iota(jnp.int32, w_cache.shape, 1)
        w = jnp.where(t_iota == idx, w_cur[:, None], w_cache)
        w = w + sbias_ref[0, hh]
        w = jnp.where(t_iota <= idx, w, NEG_INF)
        probs = jax.nn.softmax(w, axis=-1).astype(x.dtype)
        # i1 (bool) unit-dim inserts don't lower — build the value
        # substitution mask as a 3D iota (f32 [..., None] is fine)
        vc = selfv_ref[0][:, hh].astype(jnp.float32)  # [rows, Tmax, hd]
        t3 = jax.lax.broadcasted_iota(jnp.int32, vc.shape, 1)
        vc = jnp.where(
            t3 == idx, v_new[:, sl].astype(jnp.float32)[:, None, :], vc
        )
        out_h = jnp.sum(
            probs.astype(jnp.float32)[..., None] * vc, axis=1
        ).astype(x.dtype)  # [rows, hd]
        part = jax.lax.dot_general(
            out_h, w_so_ref[0][sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    x = x + (acc.astype(x.dtype) + b_misc_ref[0, 0])

    # ---- beam-shared cross attention (streamed K/V) --------------------
    # Per sample: ONE head-batched score dot [H, K, hd] x [H, hd, S] ->
    # [H, K, S], additive bias (pads prefolded to -1e9, identical
    # post-softmax probabilities to the XLA path), softmax sized exactly
    # like the XLA path's (no redundant lane-reduction work — that was
    # measured 70% slower as a block-diagonal chunk formulation), value
    # dot back to [H, K, hd], heads staged into out_s and folded by one
    # full-width out-proj matmul, exactly like the XLA path.
    h2 = _ln(x, ln[2], ln[3])
    q2 = (_dot(h2, w_cq_ref[0]) + b_misc_ref[0, 1]) * scaling  # [rows, d]
    for bb in range(B):
        slot = bb % nslots
        kdma(slot, l, bb).wait()
        vdma(slot, l, bb).wait()
        qs = jnp.concatenate(
            [
                q2[bb * K : (bb + 1) * K, hh * hd : (hh + 1) * hd][None]
                for hh in range(H)
            ],
            axis=0,
        )  # [H, K, hd]
        w2 = jax.lax.dot_general(
            qs, kbuf[slot, 0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [H, K, S]
        w2 = w2 + cbias_ref[bb][:, None, :]
        p2 = jax.nn.softmax(w2, axis=-1).astype(x.dtype)
        o2 = jax.lax.dot_general(
            p2, vbuf[slot, 0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # [H, K, hd]
        for hh in range(H):
            out_s[bb * K : (bb + 1) * K, hh * hd : (hh + 1) * hd] = o2[hh]
        # rotate: the stream stays nslots-1 samples ahead, wrapping into
        # the next layer's stream; sample nxt always lands in slot
        # nxt % nslots (the slot freed one iteration ago)
        nxt = bb + nslots - 1
        if nxt < B:
            kdma(nxt % nslots, l, nxt).start()
            vdma(nxt % nslots, l, nxt).start()
        else:

            @pl.when(l + 1 < L)
            def _():
                kdma(nxt % nslots, l + 1, nxt - B).start()
                vdma(nxt % nslots, l + 1, nxt - B).start()
    x = x + (_dot(out_s[...], w_co_ref[0]) + b_misc_ref[0, 2])

    # ---- FFN -----------------------------------------------------------
    h = _ln(x, ln[4], ln[5])
    h1 = _dot(h, w_fc1_ref[0]) + b_fc1_ref[0, 0]
    g = _gelu_exact(h1)
    h2 = _dot(g, w_fc2_ref[0]) + b_misc_ref[0, 3]
    x = x + h2

    x_s[...] = x

    @pl.when(l == L - 1)
    def _():
        xout_ref[...] = x


def pack_decoder_weights(dec_layers, dtype) -> dict:
    """Stack the per-layer decoder weights into the kernel's fused layout.

    Call ONCE per decode session (init_decoder_state) — the pack rides the
    decode loop's carried state so XLA never re-materializes it per step.
    ``dec_layers`` is the stacked params dict params["decoder"]["layers"]
    (leading L axis)."""
    sa, ea = dec_layers["self_attn"], dec_layers["encoder_attn"]
    c = lambda a: a.astype(dtype)
    f32 = lambda a: a.astype(jnp.float32)
    return {
        "w_self3": jnp.concatenate(
            [c(sa["q_proj"]["w"]), c(sa["k_proj"]["w"]), c(sa["v_proj"]["w"])],
            axis=-1,
        ),
        "b_self3": jnp.concatenate(
            [c(sa["q_proj"]["b"]), c(sa["k_proj"]["b"]), c(sa["v_proj"]["b"])],
            axis=-1,
        )[:, None, :],
        "w_so": c(sa["out_proj"]["w"]),
        "w_cq": c(ea["q_proj"]["w"]),
        "w_co": c(ea["out_proj"]["w"]),
        "w_fc1": c(dec_layers["fc1"]["w"]),
        "b_fc1": c(dec_layers["fc1"]["b"])[:, None, :],
        "w_fc2": c(dec_layers["fc2"]["w"]),
        "b_misc": jnp.stack(
            [
                c(sa["out_proj"]["b"]),
                c(ea["q_proj"]["b"]),
                c(ea["out_proj"]["b"]),
                c(dec_layers["fc2"]["b"]),
            ],
            axis=1,
        ),
        "ln": jnp.stack(
            [
                f32(dec_layers["self_attn_layer_norm"]["scale"]),
                f32(dec_layers["self_attn_layer_norm"]["bias"]),
                f32(dec_layers["encoder_attn_layer_norm"]["scale"]),
                f32(dec_layers["encoder_attn_layer_norm"]["bias"]),
                f32(dec_layers["final_layer_norm"]["scale"]),
                f32(dec_layers["final_layer_norm"]["bias"]),
            ],
            axis=1,
        ),
    }


def transpose_cross_kv(cross_k, cross_v):
    """[L, B, H, S, hd] -> the kernel's [L*B, H, hd, S'] stream layout,
    S' padded to a 128 multiple (HBM lanes are 128-tiled and
    tpu.memref_slice requires 128-aligned slices; the pad columns carry
    zero K/V and a -1e9 bias — exact post-softmax zeros).

    Call ONCE per decode session (init_decoder_state) — the result rides
    the decode loop's carried cache so XLA never re-transposes per step."""
    L, B, H, S, hd = cross_k.shape
    pad = (-S) % 128

    def t(a):
        a = jnp.transpose(a, (0, 1, 2, 4, 3)).reshape(L * B, H, hd, S)
        if pad:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return a

    return t(cross_k), t(cross_v)


@functools.partial(
    jax.jit, static_argnames=("beam_size", "scaling", "interpret")
)
def decode_stack_step(
    pack: dict,
    x0: jnp.ndarray,  # [rows, d] compute-dtype decoder input for this step
    sbias: jnp.ndarray,  # [L, rows, H, Tmax] fp32 (self_bias_t + rel_t)
    cbias: jnp.ndarray,  # [B, H, S] fp32, padding prefolded to -1e9
    self_k: jnp.ndarray,  # [L, rows, H, Tmax, hd]
    self_v: jnp.ndarray,
    cross_kt: jnp.ndarray,  # [L*B, H, hd, S] (transpose_cross_kv), S % 8 == 0
    cross_vt: jnp.ndarray,
    cache_index: jnp.ndarray,  # scalar int32
    beam_size: int,
    scaling: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused stack → (x_out [rows, d], k_new, v_new [L, rows, d])."""
    interpret = interpret or jax.default_backend() == "cpu"
    LB, H, hd, S = cross_kt.shape
    rows, d = x0.shape
    K = beam_size
    B = rows // K
    L = LB // B
    assert rows == B * K and d == H * hd and S % 8 == 0
    Tmax = self_k.shape[3]
    f = pack["w_fc1"].shape[-1]
    dt = x0.dtype
    if cbias.shape[-1] != S:  # stream S is padded to a 128 multiple
        cbias = jnp.pad(
            cbias,
            ((0, 0), (0, 0), (0, S - cbias.shape[-1])),
            constant_values=NEG_INF,
        )

    # head-major self bias (XLA-side, fused into the step program); the
    # cross-K/V arrive PRE-TRANSPOSED as [L*B, H, hd, S] once per decode
    # session (transpose_cross_kv) — the minor dim must be >= 128 lanes
    # for the kernel's manual DMAs (tpu.memref_slice miscompiles on
    # 64-lane-minor tiled HBM refs), so S rides the lanes.
    sbias_hm = jnp.transpose(sbias, (0, 2, 1, 3))  # [L, H, rows, Tmax]
    # the slot of stream element l*B + bb is (l*B + bb) % nslots with a
    # static per-bb mapping — correct across the layer wrap only when
    # B % nslots == 0 (callers gate the kernel on even B)
    nslots = 4 if B % 4 == 0 else 2
    assert B % nslots == 0, f"decode_stack needs even B, got {B}"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((rows, d), lambda l, s: (0, 0)),
            pl.BlockSpec((1, d, 3 * d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 1, 3 * d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, d, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, d, f), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 1, f), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, f, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 4, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, 6, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, H, rows, Tmax), lambda l, s: (l, 0, 0, 0)),
            pl.BlockSpec((B, H, S), lambda l, s: (0, 0, 0)),
            pl.BlockSpec((1, rows, H, Tmax, hd), lambda l, s: (l, 0, 0, 0, 0)),
            pl.BlockSpec((1, rows, H, Tmax, hd), lambda l, s: (l, 0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda l, s: (0, 0)),
            pl.BlockSpec((1, rows, d), lambda l, s: (l, 0, 0)),
            pl.BlockSpec((1, rows, d), lambda l, s: (l, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.MemorySpace.VMEM((rows, d), dt),
            pltpu.MemorySpace.VMEM((rows, d), dt),
            pltpu.MemorySpace.VMEM((nslots, 1, H, hd, S), dt),
            pltpu.MemorySpace.VMEM((nslots, 1, H, hd, S), dt),
            pltpu.SemaphoreType.DMA((nslots,)),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    kernel = functools.partial(
        _kernel, L=L, B=B, K=K, H=H, hd=hd, nslots=nslots, scaling=scaling
    )
    x_out, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, d), dt),
            jax.ShapeDtypeStruct((L, rows, d), dt),
            jax.ShapeDtypeStruct((L, rows, d), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.asarray([cache_index], jnp.int32),
        x0,
        pack["w_self3"], pack["b_self3"], pack["w_so"], pack["w_cq"],
        pack["w_co"], pack["w_fc1"], pack["b_fc1"], pack["w_fc2"],
        pack["b_misc"], pack["ln"],
        sbias_hm, cbias, self_k, self_v, cross_kt, cross_vt,
    )
    return x_out, k_new, v_new
