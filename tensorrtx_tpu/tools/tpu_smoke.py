"""Full-catalog on-device smoke sweep: compile + run EVERY registered model
on the real TPU chip with random weights.

The reference's de-facto acceptance test is "run the engine on the device"
for every model (reference tutorials/getting_started.md:91-105, and each
model README's `-d` step). This is the TPU equivalent, one command for the
whole catalog:

    python -m tensorrtx_tpu.tools.tpu_smoke            # all 76 models
    python -m tensorrtx_tpu.tools.tpu_smoke --only yolov7 rcnn
    python -m tensorrtx_tpu.tools.tpu_smoke --resume   # skip models already
                                                       # green in the JSONL

Per model, two checks:
  1. finiteness at the DEFAULT input shape (batch 1, bf16 unless the model
     is fp32-tiered) — no carve-outs: the box decodes clamp their exp
     (ops/detect.bexp), so "every output leaf finite" holds unconditionally
     even with random weights;
  2. NUMERIC digest at the golden config: the same fixed-seed
     fixture the CPU test suite pins (tests/goldens.json) is recomputed on
     the TPU (f32, matmul precision "highest" so conv numerics are pinned
     and the check isolates the XLA:TPU lowering — layouts, fusions,
     reductions, top-k, NMS loops) and compared with tolerance-banded
     assert_matches. A TPU mis-lowering that produces finite-but-wrong
     numbers fails here.

Records compile-and-first-run ms, host-wall run ms (NOTE: through the axon
relay this is dominated by ~25-30 ms RPC RTT, not device time — see
BENCH_*.json device_p50 for on-device latency), and output shapes. Results
append to TPU_SMOKE.jsonl as they land (crash-safe); `--report` renders
TPU_SMOKE.md from the JSONL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# Models whose published tier (and our perf row) is fp32.
_FP32 = {"efficient_ad", "psenet"}

# Band multiplier for the on-device digest check: XLA:TPU f32 ("highest"
# matmul precision) vs the committed CPU digests. Cross-backend residue
# (transcendental tables, reduction order) sits ~1e-4 relative on deep
# graphs; a real mis-lowering shifts digests by orders of magnitude.
DIGEST_TOL = 5.0

_GOLDENS = None


def _golden_table() -> dict:
    global _GOLDENS
    if _GOLDENS is None:
        from tensorrtx_tpu.tools.goldens import GOLDEN_PATH

        with open(GOLDEN_PATH) as f:
            _GOLDENS = json.load(f)
    return _GOLDENS

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
JSONL = os.path.join(_ROOT, "TPU_SMOKE.jsonl")
REPORT = os.path.join(_ROOT, "TPU_SMOKE.md")


def _smoke_one(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model(name)
    cfg = model.default_cfg()
    shape = tuple(model.input_shape(cfg))
    precision = "fp32" if name in _FP32 else "bf16"
    dt = jnp.float32 if precision == "fp32" else jnp.bfloat16

    params = model.build_params(RandomWeightMap(seed=0), cfg)
    params = jax.tree.map(
        lambda a: (jnp.asarray(a, dt)
                   if np.issubdtype(np.asarray(a).dtype, np.floating)
                   else jnp.asarray(a)), params)

    rng = np.random.default_rng(0)
    b = getattr(cfg, "num_segments", 1)  # tsm consumes a clip of frames
    x = jnp.asarray(rng.uniform(-1, 1, (b,) + shape), dt)

    fn = jax.jit(lambda p, xx: model.apply(p, xx, cfg))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(params, x))
    compile_ms = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(params, x))
    run_ms = (time.perf_counter() - t0) * 1e3

    leaves = jax.tree.leaves_with_path(out)
    status, note = "ok", None
    for path, leaf in leaves:
        if not hasattr(leaf, "dtype"):
            continue
        a = np.asarray(leaf, np.float32)
        if not np.isfinite(a).all():
            status = "nonfinite"
            note = f"nonfinite in {jax.tree_util.keystr(path)}"
            break
    shapes = [tuple(int(s) for s in l.shape) for _, l in leaves]
    row = {"model": name, "status": status,
           "precision": precision, "input": list(shape),
           "compile_ms": round(compile_ms, 1), "run_ms": round(run_ms, 3),
           "n_outputs": len(leaves), "out_shapes": shapes[:8]}

    # check 2: on-device numeric digest vs the committed CPU golden.
    # f32 + matmul precision "highest" pins the conv/matmul numerics so the
    # comparison isolates the TPU lowering itself (the serving-tier bf16
    # numerics are covered separately by the parity-vs-fp32 quant tests).
    if status == "ok":
        from tensorrtx_tpu.tools import goldens as G

        exp = _golden_table().get(name)
        if exp is None:
            row["digest"] = "no-golden"
        else:
            try:
                with jax.default_matmul_precision("highest"):
                    got = G.compute_golden(name)
                G.assert_matches(got, exp, ctx=name, tol=DIGEST_TOL)
                row["digest"] = "match"
            except AssertionError as e:
                status = "digest-mismatch"
                note = f"digest mismatch: {str(e)[:200]}"
                row["digest"] = "MISMATCH"
    row["status"] = status
    if note:
        row["note"] = note
    return row


def _load_done() -> dict:
    done = {}
    if os.path.exists(JSONL):
        with open(JSONL) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    done[row["model"]] = row
    return done


def render_report() -> str:
    import jax

    done = _load_done()
    rows = sorted(done.values(), key=lambda r: r["model"])
    n_ok = sum(r["status"] == "ok" for r in rows)
    dev = str(jax.devices()[0]) if rows else "?"
    n_digest = sum(r.get("digest") == "match" for r in rows)
    lines = [
        "# TPU on-device smoke sweep — full model catalog",
        "",
        f"Device: {dev}. Every registered model compiled (XLA:TPU) and "
        "executed on the real chip, twice over: (1) default input shape, "
        "batch 1, random weights — PASS = every output leaf finite, no "
        "carve-outs (box decodes clamp their exp, ops/detect.bexp); "
        "(2) the fixed-seed golden fixture recomputed on-device (f32, "
        "matmul precision \"highest\") and compared against the committed "
        "CPU digests in tests/goldens.json — PASS = tolerance-banded "
        "match, so a finite-but-wrong TPU lowering fails. Produced by "
        "`python -m tensorrtx_tpu.tools.tpu_smoke` "
        "(reference parity: the per-model \"run the engine on the device\" "
        "step with expected outputs, tutorials/getting_started.md:91-105).",
        "",
        f"**{n_ok}/{len(rows)} models green; {n_digest}/{len(rows)} "
        "digest-matched on device.**",
        "",
        "run ms is HOST WALL time through the axon relay (~25-30 ms RPC "
        "RTT floor) — it proves the run, it does not measure the device; "
        "see BENCH_*.json device_p50 / PERF.md for on-device latencies.",
        "",
        "| model | status | digest | precision | input (H,W,C) | "
        "compile+1st run ms | run ms (host wall) | outputs |",
        "|---|---|---|---|---|---:|---:|---|",
    ]
    for r in rows:
        outs = (f"{r['n_outputs']}× {r['out_shapes'][0]}"
                if r.get("out_shapes") else r.get("error", "")[:80])
        if r.get("note"):
            outs += f" — {r['note']}"
        lines.append(
            f"| {r['model']} | {r['status']} | {r.get('digest', '-')} | "
            f"{r.get('precision', '-')} | "
            f"{tuple(r['input']) if r.get('input') else '-'} | "
            f"{r.get('compile_ms', '-')} | {r.get('run_ms', '-')} | {outs} |")
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--resume", action="store_true",
                    help="skip models already green in TPU_SMOKE.jsonl")
    ap.add_argument("--report", action="store_true",
                    help="just render TPU_SMOKE.md from the JSONL")
    args = ap.parse_args(argv)

    if args.report:
        with open(REPORT, "w") as f:
            f.write(render_report())
        print(f"wrote {REPORT}")
        return 0

    from tensorrtx_tpu.core.engine import enable_persistent_cache
    from tensorrtx_tpu.core.registry import list_models

    enable_persistent_cache(os.path.join(_ROOT, ".bench_xla_cache"))
    names = args.only or list_models()
    done = _load_done() if args.resume else {}

    failures = 0
    with open(JSONL, "a") as sink:
        for i, name in enumerate(names):
            if (name in done and done[name]["status"] == "ok"
                    and done[name].get("digest") in ("match", "no-golden")):
                print(f"[{i + 1}/{len(names)}] {name}: cached ok",
                      file=sys.stderr)
                continue
            t0 = time.time()
            try:
                row = _smoke_one(name)
            except Exception as exc:  # noqa: BLE001 - record and continue
                row = {"model": name, "status": "fail",
                       "error": f"{type(exc).__name__}: {exc}"[:400]}
                failures += 1
            print(f"[{i + 1}/{len(names)}] {name}: {row['status']} "
                  f"({time.time() - t0:.1f}s)", file=sys.stderr)
            sink.write(json.dumps(row) + "\n")
            sink.flush()
    with open(REPORT, "w") as f:
        f.write(render_report())
    print(f"wrote {REPORT}; failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
