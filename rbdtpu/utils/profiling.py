"""Tracing / profiling helpers (SURVEY.md §5: the reference has none; build
plan calls for jax.profiler traces + per-kernel timing).
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that blocks on device results."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def benchmark(fn, *args, reps: int = 3, batches: int = 5) -> float:
    """Min-over-batches steady-state seconds per call (first call compiles).

    The min statistic rejects host/tunnel noise — the same discipline bench.py
    uses for the headline metric.
    """
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best
