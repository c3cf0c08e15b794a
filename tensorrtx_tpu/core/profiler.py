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

__all__ = ["StageProfiler", "device_p50_ms", "trace"]


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


def device_p50_ms(fn, args_list, iters: int = 20) -> float:
    """Median ON-DEVICE execution time of one call, from a profiler trace.

    Host-side timing of a single dispatch measures the transport (through
    this environment's network relay, ~30 ms RTT per call), not the chip.
    This runs `fn` ``iters`` times under `jax.profiler.trace`, then reads
    the executable's device-execution events (the `jit_*` entries in the
    chrome trace) and returns their median duration in ms — the honest
    single-request latency a locally-attached host would observe.
    """
    import glob
    import gzip
    import json as _json
    import os
    import re
    import tempfile

    import numpy as np

    # warmup
    out = fn(*args_list[0])
    jax.tree.map(np.asarray, out)
    tmpdir = tempfile.mkdtemp(prefix="devp50_")
    with trace(tmpdir):
        for i in range(iters):
            out = fn(*args_list[i % len(args_list)])
        jax.tree.map(np.asarray, out)
    durs = []
    pat = re.compile(r"^jit_")
    for f in glob.glob(os.path.join(tmpdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = _json.load(fh)
        for e in data.get("traceEvents", []):
            if (e.get("ph") == "X" and "dur" in e
                    and pat.match(e.get("name", ""))):
                durs.append(e["dur"])
    if not durs:
        raise RuntimeError("no device execution events found in trace")
    # keep the last `iters` events (warmup/compile replays excluded)
    durs = sorted(durs[-iters:])
    return float(np.median(durs)) / 1e3
