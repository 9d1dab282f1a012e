"""Profiling and real-time instrumentation.

The reference instruments the control loop with wall-clock timing around
update+solve, a rolling average print every 200 ticks and a deadline-overrun
warning (variable_sampling_mpc.py:110-123). This module provides the same
counters plus device-side profiling hooks (`jax.profiler` traces) and
solves/s accounting for batched runs.
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax


class Timer:
    """Wall-clock timer with rolling statistics (`time_MPC` equivalent)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.samples: List[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.samples.append(time.perf_counter() - self._t0)
        return False

    @property
    def last(self) -> float:
        return self.samples[-1]

    def rolling_mean(self) -> float:
        recent = self.samples[-self.window:]
        return sum(recent) / max(len(recent), 1)

    def series(self):
        import numpy as np

        return np.asarray(self.samples)


class DeadlineMonitor:
    """Deadline-overrun accounting (variable_sampling_mpc.py:122-123)."""

    def __init__(self, period: float, verbose: bool = True):
        self.period = period
        self.verbose = verbose
        self.overruns = 0
        self.worst = 0.0

    def check(self, elapsed: float) -> bool:
        over = elapsed > self.period
        if over:
            self.overruns += 1
            self.worst = max(self.worst, elapsed - self.period)
            if self.verbose:
                print(f"MPC exceeded the period by: {elapsed - self.period:.6f}")
        return over


def solves_per_second(batch: int, iters: int, fn, *args) -> float:
    """Throughput of a jitted batched solve: warm-up once, then time."""
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return batch * iters / (time.perf_counter() - t0)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context for TensorBoard inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
