"""Pipeline parallelism: pipeline_scan == plain lax.scan over stacked layers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from musketeer_tpu.parallel.pipeline import pipeline_scan


def test_pipeline_matches_scan(cpu_devices):
    P_stages, L, M, mb, D = 4, 8, 4, 2, 16  # payload pytree + consts variant
    mesh = Mesh(np.asarray(cpu_devices[:P_stages]), ("pipe",))
    rng = np.random.RandomState(0)
    # layer params: per-layer (w [D,D], b [D])
    layer_xs = {
        "w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    }
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)

    bias = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)  # replicated const

    def body(x, layer, consts):
        return jnp.tanh(x @ layer["w"] + layer["b"] + consts)

    # reference: plain scan over layers, per microbatch
    def ref_one(x):
        def sb(h, one):
            return body(h, one, bias), None
        out, _ = jax.lax.scan(sb, x, layer_xs)
        return out

    ref = jax.vmap(ref_one)(x_mb)
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda lx, xm, c: pipeline_scan(body, xm, lx, mesh, consts=c)
        )(layer_xs, x_mb, bias)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_pipeline_single_stage(cpu_devices):
    mesh = Mesh(np.asarray(cpu_devices[:1]), ("pipe",))
    L, M, mb, D = 3, 2, 2, 8
    rng = np.random.RandomState(1)
    layer_xs = {"w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32)}
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)

    def body(x, layer, consts):
        return x + x @ layer["w"]

    def ref_one(x):
        out, _ = jax.lax.scan(lambda h, o: (body(h, o, ()), None), x, layer_xs)
        return out

    ref = jax.vmap(ref_one)(x_mb)
    with jax.set_mesh(mesh):
        out = pipeline_scan(body, x_mb, layer_xs, mesh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5)


def test_pipeline_interleaved_matches_scan(cpu_devices):
    """V=2 virtual stages: round-robin chunk ownership, M <= P regime."""
    P_stages, L, M, mb, D, V = 4, 8, 4, 2, 16, 2
    mesh = Mesh(np.asarray(cpu_devices[:P_stages]), ("pipe",))
    rng = np.random.RandomState(2)
    layer_xs = {
        "w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.1, jnp.float32),
    }
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)
    bias = jnp.asarray(rng.randn(D) * 0.1, jnp.float32)

    def body(x, layer, consts):
        return jnp.tanh(x @ layer["w"] + layer["b"] + consts)

    def ref_one(x):
        def sb(h, one):
            return body(h, one, bias), None
        out, _ = jax.lax.scan(sb, x, layer_xs)
        return out

    ref = jax.vmap(ref_one)(x_mb)
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda lx, xm, c: pipeline_scan(
                body, xm, lx, mesh, consts=c, interleave=V
            )
        )(layer_xs, x_mb, bias)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=1e-5, atol=1e-5)


def test_pipeline_interleaved_grads(cpu_devices):
    """Gradients flow through the interleaved ring (V ppermute laps)."""
    from jax.flatten_util import ravel_pytree

    P_stages, L, M, mb, D, V = 2, 8, 2, 2, 8, 4
    mesh = Mesh(np.asarray(cpu_devices[:P_stages]), ("pipe",))
    rng = np.random.RandomState(3)
    layer_xs = {"w": jnp.asarray(rng.randn(L, D, D) * 0.1, jnp.float32)}
    x_mb = jnp.asarray(rng.randn(M, mb, D), jnp.float32)

    def body(x, layer, consts):
        return jnp.tanh(x @ layer["w"])

    def loss_ref(lx):
        def ref_one(x):
            out, _ = jax.lax.scan(
                lambda h, o: (body(h, o, ()), None), x, lx
            )
            return out
        return jnp.sum(jax.vmap(ref_one)(x_mb) ** 2)

    def loss_pipe(lx, remat):
        out = pipeline_scan(
            body, x_mb, lx, mesh, interleave=V, remat=remat
        )
        return jnp.sum(out ** 2)

    g_ref, _ = ravel_pytree(jax.grad(loss_ref)(layer_xs))
    with jax.set_mesh(mesh):
        g_p, _ = ravel_pytree(
            jax.device_get(jax.jit(jax.grad(lambda lx: loss_pipe(lx, False)))(layer_xs))
        )
        g_r, _ = ravel_pytree(
            jax.device_get(jax.jit(jax.grad(lambda lx: loss_pipe(lx, True)))(layer_xs))
        )
    scale = float(jnp.abs(g_ref).max()) + 1e-9
    assert float(jnp.abs(g_ref - g_p).max()) / scale < 1e-4
    assert float(jnp.abs(g_ref - g_r).max()) / scale < 1e-4


def test_encoder_pipeline_interleaved_parity(cpu_devices):
    """encode() with pipeline_interleave=2 over pipe=2 == plain encode."""
    from dataclasses import replace

    from musketeer_tpu.config import MeshConfig
    from musketeer_tpu.models import ofa
    from musketeer_tpu.parallel import make_mesh, shard_params
    from tests.test_model import make_batch, tiny_cfg

    cfg = tiny_cfg(use_flash_attention=True, encoder_layers=4)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=4)

    ref = ofa.encode(params, cfg, src, imgs, masks)

    cfg_p = replace(cfg, pipeline_microbatches=2, pipeline_interleave=2)
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, model=1, pipe=2))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        out = jax.jit(lambda p: ofa.encode(p, cfg_p, src, imgs, masks))(sp)
    np.testing.assert_allclose(
        np.asarray(ref.x, np.float32), np.asarray(out.x, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_encoder_pipeline_parity(cpu_devices):
    """encode() with pipeline_microbatches over a pipe mesh == plain encode."""
    from dataclasses import replace

    from musketeer_tpu.config import MeshConfig
    from musketeer_tpu.models import ofa
    from musketeer_tpu.parallel import make_mesh, shard_params
    from tests.test_model import make_batch, tiny_cfg

    cfg = tiny_cfg(use_flash_attention=True)  # 2 encoder layers
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=4)

    ref = ofa.encode(params, cfg, src, imgs, masks)

    cfg_p = replace(cfg, pipeline_microbatches=2)
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, model=1, pipe=2))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        out = jax.jit(lambda p: ofa.encode(p, cfg_p, src, imgs, masks))(sp)
    np.testing.assert_allclose(
        np.asarray(ref.x, np.float32), np.asarray(out.x, np.float32),
        rtol=2e-4, atol=2e-4,
    )


def test_encoder_pipeline_grads(cpu_devices):
    """Gradients flow through the pipelined encoder (shard_map + ppermute)."""
    from dataclasses import replace

    from jax.flatten_util import ravel_pytree

    from musketeer_tpu.config import MeshConfig
    from musketeer_tpu.models import ofa
    from musketeer_tpu.parallel import make_mesh, shard_params
    from tests.test_model import make_batch, tiny_cfg

    cfg = tiny_cfg(use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=4)

    def loss(p, c):
        out = ofa.encode(p, c, src, imgs, masks)
        return jnp.sum(out.x.astype(jnp.float32) ** 2) * 1e-3

    g_ref = jax.grad(lambda p: loss(p, cfg))(params)

    cfg_p = replace(cfg, pipeline_microbatches=2)
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, model=1, pipe=2))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        g_pipe = jax.jit(jax.grad(lambda p: loss(p, cfg_p)))(sp)
    f1, _ = ravel_pytree(g_ref)
    f2, _ = ravel_pytree(jax.device_get(g_pipe))
    scale = float(jnp.abs(f1).max()) + 1e-9
    assert float(jnp.abs(f1 - f2).max()) / scale < 1e-3

    # remat=True (cfg.remat): same gradients, stage body recomputed in bwd —
    # the memory-bounded schedule (1F1B-equivalent footprint)
    cfg_r = replace(cfg_p, remat=True)
    with jax.set_mesh(mesh):
        g_remat = jax.jit(jax.grad(lambda p: loss(p, cfg_r)))(sp)
    f3, _ = ravel_pytree(jax.device_get(g_remat))
    assert float(jnp.abs(f1 - f3).max()) / scale < 1e-3


def test_full_model_pipeline_parity(cpu_devices):
    """forward() (encoder + decoder pipelined) == plain forward."""
    from dataclasses import replace

    from musketeer_tpu.config import MeshConfig
    from musketeer_tpu.models import ofa
    from musketeer_tpu.parallel import make_mesh, shard_params
    from tests.test_model import make_batch, tiny_cfg

    cfg = tiny_cfg(use_flash_attention=True)
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    src, imgs, masks = make_batch(cfg, B=4)
    prev = jnp.asarray(np.random.RandomState(5).randint(4, 100, (4, 6)), jnp.int32)

    ref = ofa.forward(params, cfg, src, prev, imgs, masks)

    cfg_p = replace(cfg, pipeline_microbatches=2)
    mesh = make_mesh(MeshConfig(data=4, fsdp=1, model=1, pipe=2))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        out = jax.jit(lambda p: ofa.forward(p, cfg_p, src, prev, imgs, masks))(sp)
    np.testing.assert_allclose(
        np.asarray(ref[..., : cfg.vocab_size], np.float32),
        np.asarray(out[..., : cfg.vocab_size], np.float32),
        rtol=5e-4, atol=5e-4,
    )
