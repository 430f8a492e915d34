"""Sequence-parallel encoder (cfg.seq_parallel + 'seq' mesh) == plain encode.

Model-level wiring test for parallel/ring_attention.py: the full encoder
forward (ResNet stem, decomposed positional streams, compact rel bias,
ragged text padding) over a 4-device CPU ring must match the standard
single-device path, including when S does not divide the ring size (the
stream is padded with masked rows). Gradients must also match: the
backward is the reverse ring through ppermute.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from musketeer_tpu.models import ofa
from tests.test_model import make_batch, tiny_cfg


def _seq_mesh(cpu_devices, n=4):
    return Mesh(np.array(cpu_devices[:n]), ("seq",))


def test_encoder_seq_parallel_parity(cpu_devices):
    cfg = tiny_cfg(seq_parallel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=2)  # S = 4 patches + 8 text = 12

    ref = ofa.encode(params, replace(cfg, seq_parallel=False), src, imgs, masks)

    mesh = _seq_mesh(cpu_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p: ofa.encode(p, cfg, src, imgs, masks))(params)
    assert out.x.shape == ref.x.shape
    np.testing.assert_allclose(
        np.asarray(ref.x, np.float32), np.asarray(out.x, np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_encoder_seq_parallel_pads_odd_length(cpu_devices):
    # T=9 → S=13, not divisible by the 4-ring: the stream is padded to 16
    # with kpad rows and sliced back after the stack
    cfg = tiny_cfg(seq_parallel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=2, T=9)

    ref = ofa.encode(params, replace(cfg, seq_parallel=False), src, imgs, masks)

    mesh = _seq_mesh(cpu_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p: ofa.encode(p, cfg, src, imgs, masks))(params)
    assert out.x.shape == ref.x.shape  # sliced back to S_orig
    np.testing.assert_allclose(
        np.asarray(ref.x, np.float32), np.asarray(out.x, np.float32),
        rtol=1e-4, atol=1e-4,
    )


def test_forward_seq_parallel_parity(cpu_devices):
    """Full forward() (SP encoder + SP decoder: causal ring self-attn,
    query-partitioned cross attn) == plain forward; T=6 pads to 8."""
    cfg = tiny_cfg(seq_parallel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=2)
    rng = np.random.RandomState(7)
    prev = jnp.asarray(rng.randint(4, 100, (2, 6)), jnp.int32)
    prev = prev.at[0, 4:].set(cfg.pad)  # ragged target

    ref = ofa.forward(
        params, replace(cfg, seq_parallel=False), src, prev, imgs, masks
    )

    mesh = _seq_mesh(cpu_devices)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p: ofa.forward(p, cfg, src, prev, imgs, masks))(params)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(ref[..., : cfg.vocab_size], np.float32),
        np.asarray(out[..., : cfg.vocab_size], np.float32),
        rtol=5e-4, atol=5e-4,
    )


def test_forward_seq_parallel_grads(cpu_devices):
    from jax.flatten_util import ravel_pytree

    cfg = tiny_cfg(seq_parallel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=2)
    prev = jnp.asarray(
        np.random.RandomState(8).randint(4, 100, (2, 6)), jnp.int32
    )

    def loss(p, c):
        logits = ofa.forward(p, c, src, prev, imgs, masks)
        return jnp.sum(
            jax.nn.log_softmax(logits[..., : cfg.vocab_size].astype(jnp.float32)) ** 2
        ) * 1e-5

    g_ref = jax.grad(lambda p: loss(p, replace(cfg, seq_parallel=False)))(params)
    mesh = _seq_mesh(cpu_devices)
    with jax.set_mesh(mesh):
        g_sp = jax.jit(jax.grad(lambda p: loss(p, cfg)))(params)
    f1, _ = ravel_pytree(g_ref)
    f2, _ = ravel_pytree(jax.device_get(g_sp))
    scale = float(jnp.abs(f1).max()) + 1e-9
    assert float(jnp.abs(f1 - f2).max()) / scale < 2e-3


def test_encoder_seq_parallel_grads(cpu_devices):
    from jax.flatten_util import ravel_pytree

    cfg = tiny_cfg(seq_parallel=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=2)

    def loss(p, c):
        out = ofa.encode(p, c, src, imgs, masks)
        return jnp.sum(out.x.astype(jnp.float32) ** 2) * 1e-3

    g_ref = jax.grad(lambda p: loss(p, replace(cfg, seq_parallel=False)))(params)

    mesh = _seq_mesh(cpu_devices)
    with jax.set_mesh(mesh):
        g_sp = jax.jit(jax.grad(lambda p: loss(p, cfg)))(params)

    f1, _ = ravel_pytree(g_ref)
    f2, _ = ravel_pytree(jax.device_get(g_sp))
    scale = float(jnp.abs(f1).max()) + 1e-9
    assert float(jnp.abs(f1 - f2).max()) / scale < 1e-3

    # remat through the ring: same gradients
    with jax.set_mesh(mesh):
        g_rm = jax.jit(jax.grad(lambda p: loss(p, replace(cfg, remat=True))))(params)
    f3, _ = ravel_pytree(jax.device_get(g_rm))
    assert float(jnp.abs(f1 - f3).max()) / scale < 1e-3
