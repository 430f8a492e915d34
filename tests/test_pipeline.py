"""Pipeline parallelism: pipeline_scan == plain lax.scan over stacked layers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from musketeer_tpu.parallel.pipeline import pipeline_scan


def test_pipeline_matches_scan(cpu_devices):
    P_stages, L, M, mb, D = 4, 8, 4, 2, 16
    mesh = Mesh(np.asarray(cpu_devices[:P_stages]), ("pipe",))
    rng = np.random.RandomState(0)
    # layer params: per-layer (w [D,D], b [D])
    layer_xs = {
        "w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    }
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)

    def body(x, layer):
        return jnp.tanh(x @ layer["w"] + layer["b"])

    # reference: plain scan over layers, per microbatch
    def ref_one(x):
        def sb(h, one):
            return body(h, one), None
        out, _ = jax.lax.scan(sb, x, layer_xs)
        return out

    ref = jax.vmap(ref_one)(x_mb)
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda lx, xm: pipeline_scan(body, xm, lx, mesh)
        )(layer_xs, x_mb)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_pipeline_single_stage(cpu_devices):
    mesh = Mesh(np.asarray(cpu_devices[:1]), ("pipe",))
    L, M, mb, D = 3, 2, 2, 8
    rng = np.random.RandomState(1)
    layer_xs = {"w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32)}
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)

    def body(x, layer):
        return x + x @ layer["w"]

    def ref_one(x):
        out, _ = jax.lax.scan(lambda h, o: (body(h, o), None), x, layer_xs)
        return out

    ref = jax.vmap(ref_one)(x_mb)
    with jax.set_mesh(mesh):
        out = pipeline_scan(body, x_mb, layer_xs, mesh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5)
