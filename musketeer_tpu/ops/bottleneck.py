"""Fused ResNet bottleneck block (frozen-BN, stride-1, no downsample).

One Pallas kernel computes relu(x + bn3(conv3(relu(bn2(conv2(relu(bn1(
conv1(x)))))))))  — the "rest" blocks of every ResNet stage (ref:
models/ofa/resnet.py:86-133 Bottleneck.forward with frozen stats). The
XLA path materializes both Wd-wide intermediates and the C-wide conv3
output in HBM (~240 MB of traffic per layer1 block at the B8 480² train
shape vs ~120 MB ideal); fusing the whole block keeps them in VMEM.

TPU-first formulation:

- The image is viewed as a flat row-major pixel list [B, H·W, C] (a
  free reshape), so every conv becomes a plain 2-D matmul over pixels:
  conv1/conv3 are single [rows, Cin]·[Cin, Cout] dots and the 3×3 conv2
  is nine row-SHIFTED dots (tap (dy, dx) contributes
  h1[r + dy·W + dx − 1] · w2[dy,dx] to out[r]).
- Grid cells take ``th`` image rows (= th·W pixels). The one-pixel-row
  halo a 3×3 conv needs comes from two extra W-pixel input blocks whose
  index maps point at the neighbouring tiles' edge rows (clamped at the
  image boundary and zero-masked in-kernel) — no manual DMA, no
  overlapping blocks, no XLA-side halo copies.
- Column edges: flat indexing makes the dx = ±1 taps wrap between
  neighbouring image rows; the wrap contributions are zeroed with
  per-tap column masks (iota % W) — two cheap selects instead of a
  width-padded relayout.
- Frozen BatchNorm folds to a per-channel affine. The kernel applies it
  in f32 on the bf16-rounded conv output, exactly mirroring the XLA
  path's `_bn` (conv emits the compute dtype, the affine computes in
  f32) so values stay within bf16 rounding of the unfused path.

Gradients: `fused_bottleneck` carries a custom VJP whose backward
recomputes the block through the reference XLA ops and differentiates
those (a remat-style backward, bit-identical grads to the XLA path).

MEASURED NEGATIVE RESULT (probe_bottleneck.py, on-chip, B16 480²):
layer1 fused 1.69 ms/block vs XLA 1.28 (train B8: 4.42 vs 3.88 ms) —
XLA's conv lowering + fusion already beats the nine-shifted-dots
formulation, and layer2/3 (W=60/30) fail Mosaic's sublane-multiple-of-8
block rule on the W-row halo blocks. NOT wired into the model; kept as a
tested, documented attempt (value parity ≤ bf16 rounding on the row-tiled
path) in case a future shape regime (larger C, smaller W) changes the
economics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Params = Dict[str, Any]

BN_EPS = 1e-5

# VMEM budget for the center x block (bf16 bytes); th is the largest
# divisor of H that keeps th*W*C*2 under this.
_XBLOCK_BYTES = 1.7e6


def _fold_bn(p):
    """Frozen BN → per-channel (g, b): y = conv*g + b, f32."""
    g = p["scale"] * jax.lax.rsqrt(p["var"] + BN_EPS)
    b = p["bias"] - p["mean"] * g
    return g.astype(jnp.float32), b.astype(jnp.float32)


def _pick_th(H, W, C):
    for th in range(H, 0, -1):
        if H % th == 0 and th * W * C * 2 <= _XBLOCK_BYTES:
            return th
    return 1


def _kernel(xc_ref, xt_ref, xb_ref, w1_ref, w2_ref, w3_ref, aff_ref,
            out_ref, *, th, W, Wd, nH):
    i = pl.program_id(1)
    f32 = jnp.float32
    cdt = xc_ref.dtype
    g1 = aff_ref[0, :Wd]
    b1 = aff_ref[1, :Wd]
    g2 = aff_ref[2, :Wd]
    b2 = aff_ref[3, :Wd]
    g3 = aff_ref[4, :]
    b3 = aff_ref[5, :]

    xc = xc_ref[0]                    # [th*W, C]
    x_ext = jnp.concatenate([xt_ref[0], xc, xb_ref[0]], axis=0)

    # conv1 (1×1) + bn1 + relu over center+halo pixel rows
    h1 = jax.lax.dot_general(
        x_ext, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(cdt)
    h1 = jnp.maximum(h1.astype(f32) * g1[None, :] + b1[None, :], 0.0)
    h1 = h1.astype(cdt)
    # the halo W-rows are conv2's zero padding at the image boundary
    # (the clamped halo blocks carry arbitrary in-image rows there)
    r = jax.lax.broadcasted_iota(jnp.int32, h1.shape, 0)
    pad_top = jnp.logical_and(i == 0, r < W)
    pad_bot = jnp.logical_and(i == nH - 1, r >= (th + 1) * W)
    h1 = jnp.where(jnp.logical_or(pad_top, pad_bot), 0, h1)
    # one extra zero pixel each end so the nine tap slices stay in range
    zrow = jnp.zeros((1, Wd), cdt)
    h1p = jnp.concatenate([zrow, h1, zrow], axis=0)  # [(th+2)W + 2, Wd]

    # conv2 (3×3) as nine row-shifted dots; column-wrap taps masked
    rows = jax.lax.broadcasted_iota(jnp.int32, (th * W, 1), 0)
    col = rows % W
    left = col == 0          # x = 0 rows: no dx=0 (left) contribution
    right = col == W - 1     # x = W−1 rows: no dx=2 (right) contribution
    acc = jnp.zeros((th * W, Wd), f32)
    for dy in range(3):
        for dx in range(3):
            sl = jax.lax.slice_in_dim(h1p, dy * W + dx, dy * W + dx + th * W)
            c = jax.lax.dot_general(
                sl, w2_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            if dx == 0:
                c = jnp.where(left, 0.0, c)
            elif dx == 2:
                c = jnp.where(right, 0.0, c)
            acc = acc + c
    h2 = acc.astype(cdt)
    h2 = jnp.maximum(h2.astype(f32) * g2[None, :] + b2[None, :], 0.0)
    h2 = h2.astype(cdt)

    # conv3 (1×1) + bn3 + residual + relu
    y = jax.lax.dot_general(
        h2, w3_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(cdt)
    y = (y.astype(f32) * g3[None, :] + b3[None, :]).astype(cdt)
    out_ref[0] = jnp.maximum(xc + y, 0)


def _fused_forward(x: jnp.ndarray, p: Params, interpret: bool = False):
    B, H, W, C = x.shape
    Wd = p["conv1"].shape[-1]
    th = _pick_th(H, W, C)
    nH = H // th
    cdt = x.dtype

    w1 = p["conv1"][0, 0].astype(cdt)            # [C, Wd]
    w2 = p["conv2"].astype(cdt)                  # [3, 3, Wd, Wd]
    w3 = p["conv3"][0, 0].astype(cdt)            # [Wd, C]
    g1, b1 = _fold_bn(p["bn1"])
    g2, b2 = _fold_bn(p["bn2"])
    g3, b3 = _fold_bn(p["bn3"])
    # affines ride as one [6, C] f32 array (rows 0-3 are Wd wide, zero-padded)
    aff = jnp.zeros((6, C), jnp.float32)
    aff = aff.at[0, :Wd].set(g1).at[1, :Wd].set(b1)
    aff = aff.at[2, :Wd].set(g2).at[3, :Wd].set(b2)
    aff = aff.at[4].set(g3).at[5].set(b3)

    xf = x.reshape(B, H * W, C)
    interpret = interpret or jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, W=W, Wd=Wd, nH=nH),
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec((1, th * W, C), lambda b, i: (b, i, 0)),
            # halo blocks: the previous tile's last image row / the next
            # tile's first, clamped at the boundary (masked in-kernel)
            pl.BlockSpec(
                (1, W, C),
                lambda b, i, _th=th: (b, jnp.maximum(i * _th - 1, 0), 0),
            ),
            pl.BlockSpec(
                (1, W, C),
                lambda b, i, _th=th, _H=H: (
                    b, jnp.minimum((i + 1) * _th, _H - 1), 0),
            ),
            pl.BlockSpec((C, Wd), lambda b, i: (0, 0)),
            pl.BlockSpec((3, 3, Wd, Wd), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((Wd, C), lambda b, i: (0, 0)),
            pl.BlockSpec((6, C), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th * W, C), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H * W, C), cdt),
        interpret=interpret,
    )(xf, xf, xf, w1, w2, w3, aff)
    return out.reshape(B, H, W, C)


@jax.custom_vjp
def fused_bottleneck(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Fused frozen-BN bottleneck (stride 1, no downsample).

    Forward = one Pallas kernel; backward recomputes through the XLA
    reference block (remat-style), so grads match the unfused path.
    """
    return _fused_forward(x, p)


def _vjp_fwd(x, p):
    return _fused_forward(x, p), (x, p)


def _vjp_bwd(res, g):
    x, p = res
    from ..models import resnet as rn

    _, pull = jax.vjp(lambda x_, p_: rn._bottleneck(x_, p_, False), x, p)
    return pull(g)


fused_bottleneck.defvjp(_vjp_fwd, _vjp_bwd)
