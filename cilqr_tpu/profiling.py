"""Timing and profiling utilities.

Replaces utils/timer.h's wall-clock stage prints
(trajectory_planner.cpp:31-94) with block_until_ready-accurate stage timers
and jax.profiler trace capture (SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class StageTimer:
    """Accumulates per-stage wall times (device-synchronized)."""

    def __init__(self):
        self.times: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return " | ".join(f"{k}: {v * 1e3:.2f} ms" for k, v in self.times.items())


def timed(fn: Callable, *args, reps: int = 5, warmup: int = 1):
    """Best-of-reps timing of a jitted callable; returns (best_s, result)."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, result


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace capture context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
