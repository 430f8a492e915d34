"""Training-step tests: loss decreases, grad-accum consistency, criterion
semantics (smoothing support, drop-worst, R-Drop), and mesh-sharded training
on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musketeer_tpu.config import CriterionConfig, MeshConfig, OptimConfig
from musketeer_tpu.criterions import label_smoothed_ce
from musketeer_tpu.models import ofa
from musketeer_tpu.parallel import make_mesh, shard_params
from musketeer_tpu.parallel.mesh import accum_batch_sharding
from musketeer_tpu.training import TaskBatch, init_train_state, make_train_step
from tests.test_model import tiny_cfg


def text_batch(cfg, B=4, Ts=8, Tt=6, seed=0, accum=None):
    rng = np.random.RandomState(seed)
    src = rng.randint(4, cfg.vocab_size - 1, (B, Ts)).astype(np.int32)
    tgt = rng.randint(4, cfg.vocab_size - 1, (B, Tt)).astype(np.int32)
    tgt[:, -1] = cfg.eos
    prev = np.roll(tgt, 1, axis=1)
    prev[:, 0] = cfg.bos
    b = TaskBatch(
        src_tokens=jnp.asarray(src),
        prev_output_tokens=jnp.asarray(prev),
        target=jnp.asarray(tgt),
    )
    if accum is not None:
        b = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (accum,) + a.shape), b
        )
    return b


def test_ce_matches_manual():
    V, eps = 16, 0.1
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, V), jnp.float32)
    tgt = jnp.asarray([[4, 5, 1], [6, 2, 1]], jnp.int32)  # pads ignored
    out = label_smoothed_ce(logits, tgt, epsilon=eps, pad_id=1)
    lp = np.asarray(jax.nn.log_softmax(logits, -1), np.float64)
    exp_loss = 0.0
    exp_nll = 0.0
    n = 0
    for b in range(2):
        for t in range(3):
            if int(tgt[b, t]) == 1:
                continue
            nll = -lp[b, t, int(tgt[b, t])]
            smooth = -lp[b, t].sum()
            eps_i = eps / (V - 1)
            exp_loss += (1 - eps - eps_i) * nll + eps_i * smooth
            exp_nll += nll
            n += 1
    np.testing.assert_allclose(float(out.loss), exp_loss, rtol=1e-5)
    np.testing.assert_allclose(float(out.nll_loss), exp_nll, rtol=1e-5)
    assert int(out.ntokens) == n


def test_ce_constraint_masks_change_support():
    V = 16
    logits = jnp.zeros((1, 1, V))
    tgt = jnp.asarray([[4]], jnp.int32)
    cm = jnp.zeros((1, 1, V), bool).at[0, 0, jnp.asarray([4, 5, 6])].set(True)
    out = label_smoothed_ce(logits, tgt, epsilon=0.1, constraint_masks=cm)
    # with 3 allowed tokens of equal logits: nll = log(3)
    np.testing.assert_allclose(float(out.nll_loss), np.log(3.0), rtol=1e-5)


def test_ce_drop_worst():
    V = 8
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 10, V), jnp.float32)
    tgt = jnp.asarray(rng.randint(4, V, (1, 10)), jnp.int32)
    full = label_smoothed_ce(logits, tgt, epsilon=0.0)
    dropped = label_smoothed_ce(
        logits, tgt, epsilon=0.0, drop_worst_ratio=0.2,
        drop_worst_active=jnp.asarray(True),
    )
    assert int(dropped.ntokens) == 8  # floor(10 * 0.8)
    assert float(dropped.loss) < float(full.loss)
    inactive = label_smoothed_ce(
        logits, tgt, epsilon=0.0, drop_worst_ratio=0.2,
        drop_worst_active=jnp.asarray(False),
    )
    np.testing.assert_allclose(float(inactive.loss), float(full.loss), rtol=1e-6)


def test_ce_rdrop_zero_for_identical():
    """KL term vanishes when the two copies produce identical lprobs."""
    V = 8
    logits1 = jnp.asarray(np.random.RandomState(2).randn(2, 3, V), jnp.float32)
    logits = jnp.concatenate([logits1, logits1], axis=0)
    tgt1 = jnp.asarray(np.random.RandomState(3).randint(4, V, (2, 3)), jnp.int32)
    tgt = jnp.concatenate([tgt1, tgt1], axis=0)
    with_rdrop = label_smoothed_ce(logits, tgt, epsilon=0.1, use_rdrop=True)
    without = label_smoothed_ce(logits, tgt, epsilon=0.1)
    np.testing.assert_allclose(float(with_rdrop.loss), float(without.loss), rtol=1e-5)


@pytest.mark.parametrize("accum", [1, 2])
def test_train_step_decreases_loss(accum):
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(label_smoothing=0.1, drop_worst_ratio=0.0, use_rdrop=False)
    optim = OptimConfig(lr=2e-3, warmup_updates=2, total_updates=50, clip_norm=1.0, weight_decay=0.0)
    state = init_train_state(params, optim)
    step_fn = make_train_step(cfg, crit, optim, donate=False)
    batch = {"caption": text_batch(cfg, accum=accum)}
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(8):
        state, metrics = step_fn(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8


def test_multitask_step():
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig()
    optim = OptimConfig(lr=1e-3, warmup_updates=2, total_updates=50)
    state = init_train_state(params, optim, ema_decay=0.99)
    step_fn = make_train_step(cfg, crit, optim, ema_decay=0.99, donate=False)
    batches = {
        "caption": text_batch(cfg, B=2, Ts=8, Tt=6, seed=0, accum=1),
        "vqa": text_batch(cfg, B=2, Ts=10, Tt=4, seed=1, accum=1),
    }
    for i in range(3):  # step 0 has lr=0 (warmup ramp), take a few
        state, metrics = step_fn(state, batches, jax.random.PRNGKey(i))
    assert "loss/caption" in metrics and "loss/vqa" in metrics
    assert np.isfinite(float(metrics["loss"]))
    assert state.ema_params is not None
    # EMA shadow moved toward new params but differs from them
    diff = jax.tree.leaves(
        jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()), state.ema_params, state.params)
    )
    assert max(diff) > 0


def test_sharded_train_step(cpu_devices):
    """Full train step under an 8-device mesh (data=4, fsdp=2)."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(MeshConfig(data=4, fsdp=2, model=1))
    crit = CriterionConfig()
    optim = OptimConfig(lr=1e-3, warmup_updates=2, total_updates=50)

    with jax.set_mesh(mesh):
        sparams = shard_params(mesh, params)
        state = init_train_state(sparams, optim)
        step_fn = make_train_step(cfg, crit, optim, donate=False)
        batch = {"caption": jax.tree.map(
            lambda a: jax.device_put(a, accum_batch_sharding(mesh)),
            text_batch(cfg, B=8, accum=1),
        )}
        state2, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))

    # parity with unsharded step
    state_ref = init_train_state(params, optim)
    step_ref = make_train_step(cfg, crit, optim, donate=False)
    _, metrics_ref = step_ref(state_ref, {"caption": text_batch(cfg, B=8, accum=1)}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-4
    )


def test_train_loop_stop_time_hours():
    """Wall-clock budget stops the loop mid-training (ref: train.py:387-397)."""
    from dataclasses import replace

    from musketeer_tpu.config import (
        CriterionConfig, OptimConfig, TrainConfig, ofa_tiny,
    )
    from musketeer_tpu.models import ofa
    from musketeer_tpu.training import init_train_state
    from musketeer_tpu.training.trainer import train_loop

    cfg = replace(
        ofa_tiny(), embed_dim=32, ffn_dim=64, encoder_layers=1,
        decoder_layers=1, attention_heads=4, vocab_size=64,
        padded_vocab_size=64, resnet_layers=(1, 1, 1), dtype="float32",
    )
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    optim = OptimConfig(lr=1e-3, warmup_updates=1, total_updates=100)
    tcfg = TrainConfig(
        optim=optim, criterion=CriterionConfig(), max_epoch=50,
        stop_time_hours=1e-9,  # expires immediately after the first step
        ema_decay=0.0,
    )
    state = init_train_state(params, optim)

    rng = np.random.RandomState(0)
    tgt = rng.randint(4, 60, (1, 2, 4)).astype(np.int32)
    prev = np.roll(tgt, 1, -1)
    prev[..., 0] = cfg.bos
    batch = {"t": TaskBatch(
        src_tokens=jnp.asarray(rng.randint(4, 60, (1, 2, 6)), jnp.int32),
        prev_output_tokens=jnp.asarray(prev),
        target=jnp.asarray(tgt),
    )}

    class Loader:
        def set_epoch(self, e):
            pass

        def epoch_iterator(self):
            for _ in range(5):
                yield batch

    out = train_loop(tcfg, cfg, state, Loader())
    # 50 epochs x 5 steps available; the time budget cuts it to 1 step
    assert int(out.step) == 1


def test_nonfinite_grads_skip_update():
    """A batch that produces NaN loss must not corrupt the params (ref:
    trainer.py NanDetector / AMP overflow retry semantics)."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig()
    optim = OptimConfig(lr=1e-2, warmup_updates=1, total_updates=10)
    state = init_train_state(params, optim)
    step_fn = make_train_step(cfg, crit, optim, donate=False)
    bad = text_batch(cfg, accum=1)
    # poison: NaN conf weight propagates into the loss
    bad = bad._replace(conf=jnp.full((1, bad.src_tokens.shape[1]), jnp.nan)[:, :4])
    state2, metrics = step_fn(state, {"t": bad}, jax.random.PRNGKey(0))
    assert metrics["skipped_nonfinite"] == 1.0
    assert int(state2.step) == 0  # update skipped
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(b)).all()


def test_train_loop_resume_equivalence(tmp_path):
    """Kill a run mid-epoch, restart from checkpoint_last: same final state
    as an uninterrupted run (ref: train.py:176-181, trainer.py:566-626 —
    restore full state + iterator position)."""
    from dataclasses import replace

    from musketeer_tpu.config import TrainConfig, ofa_tiny
    from musketeer_tpu.training.trainer import train_loop

    cfg = replace(
        ofa_tiny(), embed_dim=32, ffn_dim=64, encoder_layers=1,
        decoder_layers=1, attention_heads=4, vocab_size=64,
        padded_vocab_size=64, resnet_layers=(1, 1, 1), dtype="float32",
    )
    optim = OptimConfig(lr=1e-3, warmup_updates=1, total_updates=100)

    class Loader:
        def set_epoch(self, e):
            self.e = e

        def epoch_iterator(self, skip_steps=0):
            rng = np.random.RandomState(100 + self.e)
            for i in range(4):
                src = rng.randint(4, 60, (1, 2, 6)).astype(np.int32)
                tgt = rng.randint(4, 60, (1, 2, 4)).astype(np.int32)
                if i < skip_steps:
                    continue  # same rng stream, examples skipped
                prev = np.roll(tgt, 1, -1)
                prev[..., 0] = cfg.bos
                yield {"t": TaskBatch(
                    src_tokens=jnp.asarray(src),
                    prev_output_tokens=jnp.asarray(prev),
                    target=jnp.asarray(tgt),
                )}

    def mk_state():
        params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
        return init_train_state(params, optim)

    base = TrainConfig(optim=optim, criterion=CriterionConfig(), max_epoch=2)

    full = train_loop(base, cfg, mk_state(), Loader(), save_dir=str(tmp_path / "full"))
    assert int(full.step) == 8  # 2 epochs x 4 steps

    part_dir = str(tmp_path / "part")
    killed = train_loop(
        replace(base, max_update=3), cfg, mk_state(), Loader(), save_dir=part_dir
    )
    assert int(killed.step) == 3  # stopped mid-epoch 1
    resumed = train_loop(base, cfg, mk_state(), Loader(), save_dir=part_dir)
    assert int(resumed.step) == 8

    for a, b in zip(jax.tree.leaves(full.params), jax.tree.leaves(resumed.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_best_requires_improvement(tmp_path):
    """checkpoint_best is only rewritten on metric improvement even with
    keep_best_checkpoints=-1 (ref: utils/checkpoint_utils.py:42-83)."""
    import os

    from musketeer_tpu.training import CheckpointManager

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    state = init_train_state(params, OptimConfig())
    mgr = CheckpointManager(str(tmp_path))  # default keep_best=-1
    w1 = mgr.step(state, 1, 10, val_metric=0.5, end_of_epoch=True)
    assert "checkpoint_best" in w1
    w2 = mgr.step(state, 2, 20, val_metric=0.3, end_of_epoch=True)
    assert "checkpoint_best" not in w2  # worse metric: do not overwrite
    w3 = mgr.step(state, 3, 30, val_metric=0.6, end_of_epoch=True)
    assert "checkpoint_best" in w3
    # interval saves: never at update 0, never duplicated at end-of-epoch
    mgr2 = CheckpointManager(str(tmp_path), save_interval_updates=10)
    w = mgr2.step(state, 1, 0, end_of_epoch=False)
    assert not any("checkpoint_1_0" in n for n in w)
    w = mgr2.step(state, 1, 10, end_of_epoch=True)
    assert not any(n.startswith("checkpoint_1_") for n in w)
    w = mgr2.step(state, 1, 10, end_of_epoch=False, steps_in_epoch=5)
    assert "checkpoint_1_10" in w
    assert os.path.exists(tmp_path / "checkpoint_1_10.meta.json")


def _text_batch_cm(cfg, B=2, Ts=8, Tt=5, seed=0, with_cm=False, with_conf=False):
    rng = np.random.RandomState(seed)
    src = rng.randint(4, cfg.vocab_size - 1, (B, Ts)).astype(np.int32)
    tgt = rng.randint(4, cfg.vocab_size - 1, (B, Tt)).astype(np.int32)
    tgt[:, -1] = cfg.eos
    prev = np.roll(tgt, 1, axis=1)
    prev[:, 0] = cfg.bos
    cm = None
    if with_cm:
        m = rng.rand(B, Tt, cfg.padded_vocab_size) < 0.5
        # targets must stay allowed
        for b in range(B):
            m[b, np.arange(Tt), tgt[b]] = True
        cm = jnp.asarray(m)
    conf = jnp.asarray(rng.rand(B).astype(np.float32) + 0.5) if with_conf else None
    return TaskBatch(
        src_tokens=jnp.asarray(src),
        prev_output_tokens=jnp.asarray(prev),
        target=jnp.asarray(tgt),
        constraint_masks=cm,
        conf=conf,
    )


@pytest.mark.parametrize("rdrop,dropw", [(False, 0.0), (True, 0.3)])
def test_packed_text_loss_matches_unpacked(rdrop, dropw):
    """Same-shape text tasks fused into ONE forward (SURVEY §7 packing) must
    reproduce the sequential per-task losses exactly: drop-worst ranking,
    R-Drop halves and ntokens all stay within each task's segment."""
    from musketeer_tpu.training.train_step import multitask_loss

    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(
        label_smoothing=0.1, use_rdrop=rdrop,
        drop_worst_ratio=dropw, drop_worst_after=0,
    )
    def vision_batch(seed):
        b = _text_batch_cm(cfg, Ts=7, Tt=5, seed=seed)
        rng = np.random.RandomState(seed + 100)
        return b._replace(
            patch_images=jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
            patch_masks=jnp.ones((2,), bool),
        )

    # three packable (same-shape, cm-less) + two packable with cm + one
    # vision-less odd-shaped task that must stay single + two vision tasks
    # sharing a resolution (vision-stem packing)
    batches = {
        "gigaword": _text_batch_cm(cfg, seed=1),
        "text_infilling": _text_batch_cm(cfg, seed=2),
        "mrpc": _text_batch_cm(cfg, seed=3),
        "cola": _text_batch_cm(cfg, Ts=10, Tt=4, seed=4, with_cm=True),
        "sst2": _text_batch_cm(cfg, Ts=10, Tt=4, seed=5, with_cm=True, with_conf=True),
        "odd": _text_batch_cm(cfg, Ts=12, Tt=3, seed=6),
        "caption": vision_batch(7),
        "refcoco": vision_batch(8),
    }
    up = jnp.int32(5)
    t_pack, m_pack = multitask_loss(
        params, cfg, crit, batches, None, up, pack_text=True, pack_vision=True
    )
    t_seq, m_seq = multitask_loss(
        params, cfg, crit, batches, None, up, pack_text=False,
        pack_vision=False,
    )
    np.testing.assert_allclose(float(t_pack), float(t_seq), rtol=2e-5)
    for k in m_seq:
        np.testing.assert_allclose(
            float(m_pack[k]), float(m_seq[k]), rtol=2e-5, err_msg=k
        )


def test_metrics_logger_derived():
    """MetricsLogger derived metrics (ref metrics.log_derived): default ppl
    from the per-task nll meters + custom registrations."""
    from musketeer_tpu.training.metrics import MetricsLogger

    m = MetricsLogger()
    m.log_step(1, {"nll/caption": 2.0, "nll/vqa": 4.0, "loss": 3.0})
    a = m.averages()
    assert abs(a["ppl"] - 2.0 ** 3.0) < 1e-6  # mean nll = 3
    m.log_derived("double_loss", lambda avgs: 2 * avgs.get("loss", 0))
    assert abs(m.averages()["double_loss"] - 6.0) < 1e-6
    # derived fns that raise are skipped, not fatal
    m.log_derived("bad", lambda avgs: avgs["missing_key"])
    assert "bad" not in m.averages()


def test_freeze_embedding_masks_updates():
    """--freeze-{encoder,decoder}-embedding parity (ref:
    unify_transformer.py:380-384, requires_grad=False on the shared
    embedding): frozen leaves must not move — not from grads, and not from
    adamw's decoupled weight decay — while everything else trains."""
    cfg = tiny_cfg()
    params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
    crit = CriterionConfig(label_smoothing=0.1)
    optim = OptimConfig(
        lr=2e-3, warmup_updates=1, total_updates=50, clip_norm=1.0,
        weight_decay=0.01, freeze_params=("embed_tokens",),
    )
    state = init_train_state(params, optim)
    step_fn = make_train_step(cfg, crit, optim, donate=False)
    batch = {"caption": text_batch(cfg, accum=1)}
    embed0 = np.asarray(state.params["embed_tokens"])
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_array_equal(np.asarray(state.params["embed_tokens"]), embed0)
    # a non-frozen leaf did move
    moved = float(
        jnp.abs(
            state.params["encoder"]["layers"]["self_attn"]["q_proj"]["w"]
            - params["encoder"]["layers"]["self_attn"]["q_proj"]["w"]
        ).max()
    )
    assert moved > 0
