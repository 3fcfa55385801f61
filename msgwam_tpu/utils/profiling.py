"""Profiling hooks: step timing and ``jax.profiler`` trace capture.
Build-side (the reference has no profiling, SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock timer that blocks on device results, so the measured time
    is real device time (first call after compile excluded via reset)."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def reset(self):
        self.times = []

    @property
    def mean(self):
        return sum(self.times) / max(1, len(self.times))

    @property
    def best(self):
        return min(self.times) if self.times else float("nan")


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a ``jax.profiler`` trace around a block (view with
    tensorboard / xprof), or no-op if no ``log_dir`` given."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
