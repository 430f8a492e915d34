"""Host/device overlap: background-thread batch prefetch.

The reference gets input-pipeline overlap from fairseq's multi-worker
EpochBatchIterator (ref: tasks/ofa_task.py:118-162, num_workers at :157);
its CPU transform pipeline is a named hot loop (SURVEY §3.1 d). Here the
batch builders (PIL decode + 480² resize + RandAug for up to 9 tasks) run
in a daemon thread feeding a bounded queue, so host batch-building and
jnp transfers overlap the device step instead of serializing with it —
the jitted step's async dispatch hides the device side, this hides the
host side.

One thread (not N processes): PIL/numpy release the GIL for the heavy
decode/resize work, the producing thread's ``jnp.stack`` device_puts the
next batch while the current step runs, and the 1-core host this was
measured on gains nothing from process fan-out.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterable, Iterator, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _Raised:
    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchIterator(Iterator[T]):
    """Wrap an iterator; a daemon thread stays ``depth`` items ahead.

    Order-preserving and exception-transparent: anything the inner
    iterator raises re-raises at the consuming ``__next__``. ``close()``
    stops the producer promptly (used when the train loop breaks early);
    it is idempotent and also runs automatically at exhaustion.
    """

    def __init__(self, iterable: Iterable[T], depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        # overlap diagnostics (VERDICT r4 #2): where does wall-clock go?
        # producer_cpu_s = CPU time the producer thread actually burned per
        # item (thread_time: excludes GIL waits + tunnel I/O blocks);
        # producer_wall_s = its wall time per item; stall_s = time the
        # consumer spent blocked on an empty queue. All resettable so a
        # bench can discard warm-up effects.
        self.producer_cpu_s = 0.0
        self.producer_wall_s = 0.0
        self.producer_items = 0
        self.stall_s = 0.0
        self.stall_count = 0
        self.consumed = 0
        self._thread = threading.Thread(
            target=self._produce, args=(iter(iterable),), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, it: Iterator[T]) -> None:
        try:
            while True:
                w0 = time.perf_counter()
                c0 = time.thread_time()
                try:
                    item = next(it)
                except StopIteration:
                    break
                self.producer_cpu_s += time.thread_time() - c0
                self.producer_wall_s += time.perf_counter() - w0
                self.producer_items += 1
                if not self._put(item):
                    return
        except BaseException as e:  # propagate to the consumer
            self._put(_Raised(e))
            return
        self._put(_SENTINEL)

    def __iter__(self) -> "PrefetchIterator[T]":
        return self

    def reset_stats(self) -> None:
        self.producer_cpu_s = self.producer_wall_s = self.stall_s = 0.0
        self.producer_items = self.stall_count = self.consumed = 0

    def __next__(self) -> T:
        if self._stop.is_set():
            raise StopIteration
        t0 = time.perf_counter()
        item = self._q.get()
        dt = time.perf_counter() - t0
        self.stall_s += dt
        if dt > 1e-3:
            self.stall_count += 1
        self.consumed += 1
        if item is _SENTINEL:
            self._stop.set()
            raise StopIteration
        if isinstance(item, _Raised):
            self._stop.set()
            raise item.exc
        return item

    def close(self) -> None:
        """Stop the producer and drop queued items (early loop exit)."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
