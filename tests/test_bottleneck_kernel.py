"""Fused ResNet bottleneck kernel vs the XLA reference block.

The Pallas kernel (ops/bottleneck.py) computes the stride-1 no-downsample
frozen-BN bottleneck (ref: models/ofa/resnet.py:86-133) as one fused pass;
these tests check value parity against `resnet._bottleneck` on the row-tiled
path (halo blocks + boundary masks exercised by shrinking the tile budget)
and grad parity (the custom VJP recomputes through the XLA block, so grads
must be bit-identical).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musketeer_tpu.models import resnet as rn
from musketeer_tpu.ops import bottleneck as bk


def _mk_block(key, c, width):
    p = rn._block_init(key, c, width, c, downsample=False)
    # non-trivial frozen stats so BN folding is actually tested
    ks = jax.random.split(key, 4)
    for i, bn in enumerate(("bn1", "bn2", "bn3")):
        cdim = p[bn]["mean"].shape[0]
        p[bn]["mean"] = jax.random.normal(ks[i], (cdim,)) * 0.1
        p[bn]["var"] = jnp.abs(jax.random.normal(ks[i], (cdim,))) + 0.5
        p[bn]["scale"] = 1.0 + jax.random.normal(ks[i], (cdim,)) * 0.1
        p[bn]["bias"] = jax.random.normal(ks[i], (cdim,)) * 0.1
    return p


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 0.03)])
@pytest.mark.parametrize("tiled", [False, True])
def test_fused_bottleneck_matches_xla(dtype, tol, tiled, monkeypatch):
    if tiled:
        # force th < H so the halo blocks + boundary masks are exercised
        monkeypatch.setattr(bk, "_XBLOCK_BYTES", 12 * 16 * 2 * 3.0)
    key = jax.random.PRNGKey(0)
    B, H, W, C, width = 2, 12, 12, 16, 8
    p = _mk_block(key, C, width)
    x = (jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C)) * 2).astype(dtype)

    ref = rn._bottleneck(x, p, train=False)
    got = bk.fused_bottleneck(x, p)
    assert got.dtype == ref.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=tol, rtol=tol)


def test_fused_bottleneck_grads_match_xla():
    key = jax.random.PRNGKey(2)
    B, H, W, C, width = 1, 8, 8, 16, 8
    p = _mk_block(key, C, width)
    x = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, C))
    cot = jax.random.normal(jax.random.PRNGKey(4), (B, H, W, C))

    def loss(fn, x_, p_):
        return jnp.sum(fn(x_, p_) * cot)

    gx_r, gp_r = jax.grad(lambda x_, p_: loss(
        lambda a, b: rn._bottleneck(a, b, False), x_, p_), argnums=(0, 1))(x, p)
    gx_f, gp_f = jax.grad(lambda x_, p_: loss(
        bk.fused_bottleneck, x_, p_), argnums=(0, 1))(x, p)
    # backward IS the XLA pullback — grads are bit-identical
    np.testing.assert_array_equal(np.asarray(gx_f), np.asarray(gx_r))
    for kk in gp_r:
        for leaf_r, leaf_f in zip(
                jax.tree.leaves(gp_r[kk]), jax.tree.leaves(gp_f[kk])):
            np.testing.assert_array_equal(np.asarray(leaf_f), np.asarray(leaf_r))


def test_fused_bottleneck_nonsquare_rows():
    # H != W and th that doesn't divide into one tile
    key = jax.random.PRNGKey(5)
    B, H, W, C, width = 1, 10, 6, 16, 8
    p = _mk_block(key, C, width)
    x = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))
    ref = rn._bottleneck(x, p, train=False)
    got = bk.fused_bottleneck(x, p)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
