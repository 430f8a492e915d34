"""Ring attention (sequence parallelism) vs single-device reference.

Forward equivalence and gradient parity on a 4-device CPU ring at tiny
shapes (the host is single-core; big CPU-mesh programs trip the
collective-rendezvous watchdog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from musketeer_tpu.ops.flash_attention import attention_reference
from musketeer_tpu.parallel.ring_attention import ring_attention


def _mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("seq",))


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape) * scale, jnp.float32
    )


@pytest.mark.parametrize("causal,has_pos,has_rel", [
    (False, True, True),
    (True, True, True),
    (False, False, False),
])
def test_ring_attention_matches_reference(causal, has_pos, has_rel):
    B, H, S, D = 2, 2, 64, 8
    q = _rand((B, H, S, D), 0)
    k = _rand((B, H, S, D), 1)
    v = _rand((B, H, S, D), 2, 1.0)
    pq = _rand((B, H, S, D), 3) if has_pos else None
    pk = _rand((B, H, S, D), 4) if has_pos else None
    rel = _rand((H, S, S), 5) if has_rel else None
    kpad = jnp.zeros((B, S), bool).at[0, -9:].set(True)
    mesh = _mesh()

    out = jax.jit(
        lambda *a: ring_attention(*a, mesh=mesh, causal=causal)
    )(q, k, v, pq, pk, rel, kpad)

    z = jnp.zeros_like(q)
    ref = attention_reference(
        q, k, v, pq if has_pos else z, pk if has_pos else z,
        rel if has_rel else jnp.zeros((H, S, S), q.dtype),
        kpad, causal=causal,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_ring_attention_grad_parity():
    B, H, S, D = 1, 2, 32, 8
    q = _rand((B, H, S, D), 0)
    k = _rand((B, H, S, D), 1)
    v = _rand((B, H, S, D), 2, 1.0)
    pq, pk = _rand((B, H, S, D), 3), _rand((B, H, S, D), 4)
    rel = _rand((H, S, S), 5)
    kpad = jnp.zeros((B, S), bool)
    mesh = _mesh()
    g = _rand((B, H, S, D), 6)

    def loss_ring(q, k, v, pq, pk, rel):
        o = ring_attention(q, k, v, pq, pk, rel, kpad, mesh=mesh,
                           causal=True)
        return jnp.sum(o * g)

    def loss_ref(q, k, v, pq, pk, rel):
        o = attention_reference(q, k, v, pq, pk, rel, kpad, causal=True)
        return jnp.sum(o * g)

    gr = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, pq, pk, rel)
    gf = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5)))(
        q, k, v, pq, pk, rel)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        )
