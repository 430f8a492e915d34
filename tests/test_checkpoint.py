"""Checkpoint save/restore round-trip + save policy + early stopper."""

import jax
import jax.numpy as jnp
import numpy as np

from musketeer_tpu.config import OptimConfig
from musketeer_tpu.models import ofa
from musketeer_tpu.training import (
    CheckpointManager, EarlyStopper, init_train_state, load_checkpoint,
    save_checkpoint,
)
from tests.test_model import tiny_cfg


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig()
    state = init_train_state(params, optim, ema_decay=0.99)
    state = state._replace(step=jnp.int32(17))
    save_checkpoint(str(tmp_path), state, "checkpoint_last", {"epoch": 3})
    template = init_train_state(
        ofa.init_ofa_params(jax.random.PRNGKey(1), cfg), optim, ema_decay=0.99
    )
    restored, meta = load_checkpoint(str(tmp_path), template)
    assert int(restored.step) == 17
    assert meta["epoch"] == 3
    l1 = jax.tree.leaves(state.params)
    l2 = jax.tree.leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_roundtrip(tmp_path):
    """async_save returns before the write lands; load (which flushes
    in-flight writes) restores identical values."""
    from musketeer_tpu.training import wait_for_saves

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig()
    state = init_train_state(params, optim)._replace(step=jnp.int32(5))
    save_checkpoint(str(tmp_path), state, "async1", {"e": 1}, async_save=True)
    # immediately load without an explicit wait — load flushes internally
    template = init_train_state(
        ofa.init_ofa_params(jax.random.PRNGKey(9), cfg), optim
    )
    restored, meta = load_checkpoint(str(tmp_path), template, "async1")
    assert int(restored.step) == 5 and meta["e"] == 1
    np.testing.assert_array_equal(
        np.asarray(state.params["embed_tokens"]),
        np.asarray(restored.params["embed_tokens"]),
    )
    # two back-to-back async saves serialize cleanly
    save_checkpoint(str(tmp_path), state, "async2", None, async_save=True)
    save_checkpoint(
        str(tmp_path), state._replace(step=jnp.int32(7)), "async2", None,
        async_save=True,
    )
    wait_for_saves()
    restored2, _ = load_checkpoint(str(tmp_path), template, "async2")
    assert int(restored2.step) == 7


def test_checkpoint_ema_structure_adaptation(tmp_path):
    """EMA ckpt restores into a no-EMA template (eval without --use-ema) and
    a no-EMA ckpt into an EMA-free slot — no orbax structure mismatch."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig()

    # EMA checkpoint ← no-EMA template
    state = init_train_state(params, optim, ema_decay=0.99)
    save_checkpoint(str(tmp_path), state, "with_ema")
    template = init_train_state(
        ofa.init_ofa_params(jax.random.PRNGKey(1), cfg), optim
    )
    assert template.ema_params is None
    restored, _ = load_checkpoint(str(tmp_path), template, "with_ema")
    assert restored.ema_params is not None  # shadow still available
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["embed_tokens"]),
        np.asarray(state.ema_params["embed_tokens"]),
    )

    # no-EMA checkpoint ← EMA template
    state0 = init_train_state(params, optim)
    save_checkpoint(str(tmp_path), state0, "no_ema")
    template_e = init_train_state(
        ofa.init_ofa_params(jax.random.PRNGKey(2), cfg), optim, ema_decay=0.99
    )
    restored0, _ = load_checkpoint(str(tmp_path), template_e, "no_ema")
    assert restored0.ema_params is None


def test_checkpoint_manager_best_policy(tmp_path):
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, OptimConfig())
    mgr = CheckpointManager(str(tmp_path), keep_best_checkpoints=2)
    w1 = mgr.step(state, 1, 10, val_metric=0.5, end_of_epoch=True)
    assert "checkpoint_best" in w1 and "checkpoint1" in w1
    w2 = mgr.step(state, 2, 20, val_metric=0.7, end_of_epoch=True)
    assert "checkpoint_best" in w2
    w3 = mgr.step(state, 3, 30, val_metric=0.4, end_of_epoch=True)
    assert "checkpoint_best" not in w3
    import os

    kept = [
        d for d in os.listdir(tmp_path)
        if d.startswith("checkpoint.best") and (tmp_path / d).is_dir()
    ]
    assert len(kept) == 2  # 0.7 and 0.5 kept, 0.4 evicted


def test_early_stopper():
    s = EarlyStopper(patience=2, maximize=True)
    assert not s.should_stop(0.5)
    assert not s.should_stop(0.6)
    assert not s.should_stop(0.55)  # run 1
    assert s.should_stop(0.55)  # run 2 → stop
    s2 = EarlyStopper(patience=-1, maximize=True)
    assert not s2.should_stop(0.1)


def test_sharded_checkpoint_roundtrip(tmp_path, cpu_devices):
    """Save/restore with mesh-sharded params (orbax + NamedSharding)."""
    import jax.numpy as jnp
    from musketeer_tpu.config import MeshConfig
    from musketeer_tpu.parallel import make_mesh, shard_params

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
    with jax.set_mesh(mesh):
        sp = shard_params(mesh, params)
        state = init_train_state(sp, OptimConfig())._replace(step=jnp.int32(5))
        save_checkpoint(str(tmp_path), state, "sharded")
        template = init_train_state(sp, OptimConfig())
        restored, _ = load_checkpoint(str(tmp_path), template, "sharded")
    assert int(restored.step) == 5
    a = jax.tree.leaves(state.params)[3]
    b = jax.tree.leaves(restored.params)[3]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
