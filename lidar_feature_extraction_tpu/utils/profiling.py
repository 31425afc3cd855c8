"""Profiling helpers: JAX trace capture + per-stage throughput counters.

The reference's only profiling hooks are compiler flags (-pg, coverage;
SURVEY.md §5). Here profiling is part of the framework: wrap any stage
with ``StageTimer`` for scans/s accounting, or use ``trace`` to capture
a TensorBoard-viewable device trace of the hot path.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-time per named stage; blocks on device results
    so timings are honest under async dispatch."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name]
                / max(self.counts[name], 1),
                "per_sec": self.counts[name] / self.totals[name]
                if self.totals[name] > 0 else float("inf"),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a JAX profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
