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


def device_dispatch_times(logdir: str, gap_ms: float = 5.0):
    """Extract per-dispatch ON-DEVICE execution times from a
    jax.profiler trace directory (works over the axon tunnel —
    docs/PERF.md "Kernel-level profile").

    Parses the Chrome-trace JSON(.gz) the profiler writes, keeps the
    duration events on DEVICE timeline processes (process_name metadata
    containing 'TPU'/'device', excluding host/python threads), sorts
    them by timestamp and clusters them at gaps > gap_ms (sequential
    un-amortized dispatches are separated by the host round-trip, tens
    of ms on this rig). Returns a list of per-cluster dicts:
    {'span_ms': last_end - first_start (device wall time of the
    dispatch, including inter-kernel bubbles), 'busy_ms': sum of kernel
    durations, 'n_events': count}.
    """
    import glob
    import gzip
    import json as _json
    import os

    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    paths += glob.glob(os.path.join(logdir, "**", "*.trace.json"),
                       recursive=True)
    events = []
    for p in paths:
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as f:
            data = _json.load(f)
        evs = data.get("traceEvents", [])
        # device pids via process_name metadata
        dev_pids = set()
        for e in evs:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                name = str(e.get("args", {}).get("name", ""))
                low = name.lower()
                if (("tpu" in low or "device" in low or "/gpu" in low)
                        and "host" not in low and "python" not in low):
                    dev_pids.add(e.get("pid"))
        for e in evs:
            if (e.get("ph") == "X" and e.get("pid") in dev_pids
                    and e.get("dur", 0) > 0):
                events.append((float(e["ts"]), float(e["dur"])))
    if not events:
        return []
    events.sort()
    gap_us = gap_ms * 1e3
    clusters = []
    cur = [events[0]]
    cur_end = events[0][0] + events[0][1]
    for ts, dur in events[1:]:
        if ts - cur_end > gap_us:
            clusters.append(cur)
            cur = []
            cur_end = ts + dur
        else:
            cur_end = max(cur_end, ts + dur)
        cur.append((ts, dur))
    clusters.append(cur)
    out = []
    for cl in clusters:
        start = min(ts for ts, _ in cl)
        end = max(ts + dur for ts, dur in cl)
        out.append({"span_ms": (end - start) / 1e3,
                    "busy_ms": sum(d for _, d in cl) / 1e3,
                    "n_events": len(cl)})
    return out
