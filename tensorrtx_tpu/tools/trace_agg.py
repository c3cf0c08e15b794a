"""Aggregate a jax.profiler trace into per-op / per-category device time.

The TPU analog of the reference's IProfiler per-layer table
(tutorials/measure_performance.md:13-109): run the program under
``jax.profiler.trace(logdir)``, then point this tool at the logdir. It reads
the Chrome-trace export (``*.trace.json.gz``), keeps device "X"-phase events
that carry an ``hlo_category``, and prints three views:

  - by category (convolution fusion / data formatting / loop fusion / …):
    "data formatting" is XLA relayout copies — the usual v5e pathology;
  - by source line (the Python op that generated the HLO);
  - top individual ops with their HLO long name (shapes + layouts).

Usage:
  python -m tensorrtx_tpu.tools.trace_agg /tmp/my_trace --iters 8 --batch 32

``--iters`` divides totals by the number of traced executions, ``--batch``
further normalizes to per-image time.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict

__all__ = ["aggregate", "main"]


def aggregate(logdir: str):
    """→ (events, cat_totals, src_totals, op_totals, op_longnames); times µs."""
    files = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    cat = defaultdict(float)
    src = defaultdict(float)
    ops = defaultdict(float)
    names = {}
    for e in evs:
        a = e.get("args") or {}
        c = a.get("hlo_category")
        if not c:
            continue
        d = e.get("dur", 0.0)
        cat[c] += d
        src[(a.get("source") or "?").split("/")[-1]] += d
        ops[e["name"]] += d
        names[e["name"]] = a.get("long_name") or ""
    return evs, cat, src, ops, names


def main(argv=None):
    ap = argparse.ArgumentParser(
        "trace_agg", description="per-op device-time table from a jax trace")
    ap.add_argument("logdir")
    ap.add_argument("--iters", type=int, default=1,
                    help="traced executions (divides totals)")
    ap.add_argument("--batch", type=int, default=1,
                    help="images per execution (per-image normalization)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args(argv)
    _, cat, src, ops, names = aggregate(args.logdir)
    n = args.iters * args.batch
    tot = sum(cat.values())
    print(f"total device op time: {tot / args.iters / 1e3:.2f} ms/iter "
          f"({tot / n:.1f} us/img)")
    print("\nby category (us/img):")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {v / n:9.1f}  {k}")
    print("\nby source line (us/img, top %d):" % args.top)
    for k, v in sorted(src.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v / n:9.1f}  {k}")
    print("\ntop ops (us/img):")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {v / n:9.1f}  {k}: {names[k][:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
