"""Background batch prefetch (training/prefetch.py): ordering, errors,
early-exit shutdown, and train_loop equivalence with/without prefetch."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musketeer_tpu.training.prefetch import PrefetchIterator


def test_order_and_completeness():
    out = list(PrefetchIterator(iter(range(100)), depth=3))
    assert out == list(range(100))


def test_exception_propagates():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom")

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)
    # exhausted after the error
    with pytest.raises(StopIteration):
        next(it)


def test_close_stops_producer_early():
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), depth=2)
    assert next(it) == 0
    it.close()
    time.sleep(0.3)
    # producer stopped near the queue bound, far short of the full source
    assert len(produced) < 20
    with pytest.raises(StopIteration):
        next(it)


def test_producer_stays_depth_bounded():
    produced = []

    def gen():
        for i in range(50):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), depth=2)
    time.sleep(0.3)  # give the producer time to run ahead
    assert len(produced) <= 4  # depth + in-flight slack
    assert list(it) == list(range(50))
    assert len(produced) == 50


def test_train_loop_prefetch_equivalence():
    """Identical final params with prefetch_depth 0 vs 2 (the thread must
    not perturb batch order or rng folding)."""
    from dataclasses import replace

    from musketeer_tpu.config import (
        CriterionConfig, OptimConfig, TrainConfig, ofa_tiny,
    )
    from musketeer_tpu.models import ofa
    from musketeer_tpu.training import TaskBatch, init_train_state
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
            for _ in range(4):
                src = rng.randint(4, 60, (1, 2, 6)).astype(np.int32)
                tgt = rng.randint(4, 60, (1, 2, 4)).astype(np.int32)
                prev = np.roll(tgt, 1, -1)
                prev[..., 0] = cfg.bos
                yield {"t": TaskBatch(
                    src_tokens=jnp.asarray(src),
                    prev_output_tokens=jnp.asarray(prev),
                    target=jnp.asarray(tgt),
                )}

    def run(depth):
        params = ofa.init_ofa_params(jax.random.PRNGKey(0), cfg)
        state = init_train_state(params, optim)
        tcfg = TrainConfig(
            optim=optim, criterion=CriterionConfig(), max_epoch=1,
            prefetch_depth=depth,
        )
        return train_loop(tcfg, cfg, state, Loader())

    a, b = run(0), run(2)
    assert int(a.step) == int(b.step) == 4
    for x, y in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_overlap_stats():
    """Producer/consumer stat counters (VERDICT r4 #2: the wall-clock bench
    decomposition): producer cpu/wall accumulate per item, consumer stalls
    register when the queue runs dry, reset_stats zeroes the window."""

    def slow_gen():
        for i in range(6):
            t0 = time.perf_counter()
            while time.perf_counter() - t0 < 0.02:  # busy build ~20ms
                pass
            yield i

    it = PrefetchIterator(slow_gen(), depth=1)
    out = list(it)
    assert out == list(range(6))
    assert it.producer_items == 6
    assert it.producer_wall_s >= 6 * 0.015
    assert it.producer_cpu_s > 0
    # consumer drained faster than the producer built → stalls recorded
    assert it.stall_count >= 1
    assert it.consumed == 7  # 6 items + sentinel
    it.reset_stats()
    assert it.producer_items == 0 and it.stall_s == 0.0 and it.consumed == 0
