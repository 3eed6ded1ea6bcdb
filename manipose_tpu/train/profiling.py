"""Profiling and throughput instrumentation.

The reference has no tracing at all (SURVEY §5); here a thin wrapper
around ``jax.profiler`` plus step-time/throughput counters, wired into
the drivers via ``run.profile_dir``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]):
    """Capture a jax profiler trace (open with TensorBoard/XProf)."""
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(str(profile_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """sequences/sec (per chip) over a sliding window."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = None
        self._seen_first = False
        self._sequences = 0
        self._steps = 0

    def step(self, batch_size: int) -> None:
        # step() is called BEFORE each train_step dispatch; the first
        # dispatch traces + compiles (minutes on a remote TPU), so the
        # clock starts at the SECOND call — after the compiling step has
        # returned — and that first step is excluded from the window
        if not self._seen_first:
            self._seen_first = True
            return
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._sequences += batch_size
        self._steps += 1

    @property
    def seq_per_sec(self) -> float:
        if not self._t0 or not self._steps:
            return 0.0
        return self._sequences / (time.perf_counter() - self._t0)

    @property
    def ms_per_step(self) -> float:
        if not self._t0 or not self._steps:
            return 0.0
        return (time.perf_counter() - self._t0) / self._steps * 1e3
