"""Profiling — the IProfiler / SimpleProfiler analog.

Reference: tutorials/measure_performance.md:13-109 (per-layer ms table via
IProfiler::reportLayerTime) and vit/profiler.cc. On TPU per-op timing lives
in the XLA trace: `trace()` wraps jax.profiler and dumps an xplane the user
opens in TensorBoard/XProf; `StageProfiler` gives the per-stage wall-clock
table for the host-visible pipeline stages (decode, H2D, run, D2H, post).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List

import jax

__all__ = ["StageProfiler", "trace"]


class StageProfiler:
    """Accumulates wall-clock per named stage; prints a SimpleProfiler-style
    aggregated table (count, total ms, mean ms)."""

    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, block: bool = False):
        t0 = time.perf_counter()
        yield
        if block:
            pass  # caller is responsible for materializing device values
        self.times[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float):
        self.times[name].append(seconds)

    def table(self) -> str:
        rows = [f"{'stage':<24}{'count':>7}{'total ms':>12}{'mean ms':>10}"]
        for name, ts in self.times.items():
            rows.append(f"{name:<24}{len(ts):>7}{sum(ts) * 1e3:>12.2f}"
                        f"{sum(ts) / len(ts) * 1e3:>10.3f}")
        return "\n".join(rows)

    def report(self):
        print(self.table())


@contextlib.contextmanager
def trace(logdir: str):
    """Dump an XLA xplane trace for TensorBoard (`--profile` flag analog)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
