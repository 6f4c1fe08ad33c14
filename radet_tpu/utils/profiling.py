"""Profiling / step-timing utilities.

TPU-native replacement for the reference's CUDA-event ``profile_time``
context manager (/root/reference/radet/utils/profiling.py:9-40): wall-clock
timing with device synchronization, plus jax.profiler trace capture for
tensorboard ("xplane") inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(name: str, logger=None, sync: bool = True, enabled: bool = True):
    """Time a block, synchronizing outstanding device work at exit."""
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    yield
    if sync:
        # drain the async dispatch queue so the measurement is honest
        jax.effects_barrier()
    dt = (time.perf_counter() - t0) * 1000
    msg = f"{name}: {dt:.2f} ms"
    if logger is not None:
        logger.info(msg)
    else:
        print(msg)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Sliding-window steps/sec + images/sec tracker for the train loop."""

    def __init__(self, window: int = 50):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    @property
    def ms_per_step(self) -> float:
        return 1000 * sum(self.times) / len(self.times) if self.times else 0.0

    def images_per_sec(self, batch_size: int) -> float:
        if not self.times:
            return 0.0
        return batch_size * len(self.times) / sum(self.times)
