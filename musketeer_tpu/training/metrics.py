"""Metrics aggregation + TensorBoard logging + profiling hooks.

Replaces fairseq's metrics/meters/progress_bar stack (ref: train.py:284-309,
trainer.py:1025-1036, 1435-1451) with a small smoothed-meter tree and
tf.summary TensorBoard writing (tensorflow is host-side only). Profiling uses
jax.profiler traces instead of the reference's NVTX/CUDA-event timers
(ref: train.py:537-540, models/ofa/ofa.py:39-41, SURVEY.md §5 tracing).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class SmoothedMeter:
    """Running average over a window (fairseq AverageMeter equivalent)."""

    def __init__(self, round_digits: int = 4):
        self.sum = 0.0
        self.count = 0
        self.last = 0.0
        self.round = round_digits

    def update(self, value: float, n: int = 1):
        self.sum += value * n
        self.count += n
        self.last = value

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0

    def reset(self):
        self.sum, self.count, self.last = 0.0, 0, 0.0


class MetricsLogger:
    """Scalar aggregation + optional TensorBoard writer + ups/wps meters.

    Derived metrics (the reference's ``metrics.log_derived``,
    ref: train.py:284-309, tasks log_derived ppl/cider): register a name +
    fn over the averages dict with :meth:`log_derived`; defaults cover
    perplexity from nll and wall-clock ups.
    """

    def __init__(self, tb_dir: Optional[str] = None):
        self.meters: Dict[str, SmoothedMeter] = defaultdict(SmoothedMeter)
        self._writer = None
        if tb_dir:
            try:
                import tensorflow as tf

                self._writer = tf.summary.create_file_writer(tb_dir)
            except Exception:
                self._writer = None
        self._t0 = time.time()
        self._last_step = 0
        self._derived: Dict[str, object] = {}
        # fairseq-style defaults: ppl = 2^nll (ref: utils.get_perplexity),
        # over the mean of the per-task nll meters the train step emits
        def _ppl(a):
            nlls = [v for k, v in a.items() if k == "nll" or k.startswith("nll/")]
            if not nlls:
                return None
            return float(2.0 ** min(sum(nlls) / len(nlls), 30.0))

        self.log_derived("ppl", _ppl)

    def log_derived(self, name: str, fn):
        """Register a derived metric: fn(averages_dict) -> float | None."""
        self._derived[name] = fn

    def update(self, values: Dict[str, float], n: int = 1):
        for k, v in values.items():
            self.meters[k].update(float(v), n)

    def log_step(self, step: int, values: Dict[str, float]):
        self.update(values)
        dt = time.time() - self._t0
        if dt > 0 and step > self._last_step:
            self.meters["ups"].update((step - self._last_step) / dt)
        self._t0 = time.time()
        self._last_step = step
        if self._writer is not None:
            import tensorflow as tf

            with self._writer.as_default():
                for k, v in values.items():
                    tf.summary.scalar(k, float(v), step=step)
                for k, v in self._eval_derived().items():
                    tf.summary.scalar(k, v, step=step)

    def _eval_derived(self) -> Dict[str, float]:
        avgs = {k: m.avg for k, m in self.meters.items()}
        out = {}
        for name, fn in self._derived.items():
            try:
                v = fn(avgs)
            except Exception:
                v = None
            if v is not None:
                out[name] = float(v)
        return out

    def averages(self) -> Dict[str, float]:
        return {
            **{k: m.avg for k, m in self.meters.items()},
            **self._eval_derived(),
        }

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def flush(self):
        if self._writer is not None:
            self._writer.flush()


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/musketeer_profile"):
    """jax.profiler trace scope — TPU-native replacement for the reference's
    `--profile` NVTX path (ref: train.py:537-540). View with TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def named_scope(name: str):
    """Annotation scope visible in XLA profiles (record_function equivalent,
    ref: trainer.py:848-894)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
