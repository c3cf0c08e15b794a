"""Turnkey real-weights validation: build → infer → compare-to-expected.

The reference's acceptance flow is manual (tutorials/getting_started.md:85-105:
train lenet → gen_wts → build → run the bundled digit → "the output should
be same"; crnn/README.md:31-34 prints the expected text). This tool makes
that one command:

    python -m tensorrtx_tpu.cli validate lenet -w lenet5.wts \
        --image /path/6.pgm --expect tests/expected/lenet_6pgm_seed0.json

Given a real .wts and an image it builds the engine, runs the per-task
driver (core/tasks.py preprocess+present), and compares the JSON result to
the expected file with per-task tolerances — PASS/FAIL exit code. With
--save-expected it writes the expected file instead (for generating new
fixtures once real checkpoints are available).

Expected-file format:
    {"model": "lenet", "task": "gray_cls",
     "result": {...},              # the present() output to match
     "tolerances": {"atol": 1e-3, "rtol": 1e-3,
                    "box_iou": 0.7, "score_atol": 0.05}}
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

DEFAULT_TOL = {"atol": 1e-3, "rtol": 1e-3, "box_iou": 0.7,
               "score_atol": 0.05}


def _iou(a, b) -> float:
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    ua = max(0.0, ax2 - ax1) * max(0.0, ay2 - ay1) \
        + max(0.0, bx2 - bx1) * max(0.0, by2 - by1) - inter
    return inter / ua if ua > 0 else 0.0


def _compare_dets(exp: List[dict], got: List[dict], tol: dict,
                  errs: List[str], path: str) -> None:
    """Detection lists match by best-IoU assignment: every expected box must
    find a prediction with IoU ≥ box_iou, same class, score within
    score_atol (the reference's de-facto bar: same detections, not
    bit-equal logits)."""
    if len(exp) != len(got):
        errs.append(f"{path}: {len(got)} detections, expected {len(exp)}")
    used = set()
    for i, e in enumerate(exp):
        best, best_j = -1.0, -1
        for j, g in enumerate(got):
            if j in used:
                continue
            v = _iou(e["box"], g["box"])
            if v > best:
                best, best_j = v, j
        if best < tol["box_iou"]:
            errs.append(f"{path}[{i}]: best IoU {best:.3f} < "
                        f"{tol['box_iou']} for box {e['box']}")
            continue
        used.add(best_j)
        g = got[best_j]
        if int(g.get("class", -1)) != int(e.get("class", -1)):
            errs.append(f"{path}[{i}]: class {g.get('class')} != "
                        f"{e.get('class')}")
        if abs(float(g.get("score", 0)) - float(e.get("score", 0))) \
                > tol["score_atol"]:
            errs.append(f"{path}[{i}]: score {g.get('score')} vs "
                        f"{e.get('score')} (atol {tol['score_atol']})")


def _compare(exp: Any, got: Any, tol: dict, errs: List[str],
             path: str = "$") -> None:
    if isinstance(exp, dict):
        if not isinstance(got, dict):
            errs.append(f"{path}: expected dict, got {type(got).__name__}")
            return
        for k, v in exp.items():
            if k == "detections" and isinstance(v, list):
                _compare_dets(v, got.get(k, []), tol, errs, f"{path}.{k}")
                continue
            if k not in got:
                errs.append(f"{path}.{k}: missing")
                continue
            _compare(v, got[k], tol, errs, f"{path}.{k}")
        return
    if isinstance(exp, (list, tuple)):
        if not isinstance(got, (list, tuple)) or len(got) != len(exp):
            errs.append(f"{path}: length {len(got) if isinstance(got, (list, tuple)) else '?'}"
                        f" != {len(exp)}")
            return
        for i, (e, g) in enumerate(zip(exp, got)):
            _compare(e, g, tol, errs, f"{path}[{i}]")
        return
    if isinstance(exp, bool) or isinstance(exp, str) or exp is None:
        if got != exp:
            errs.append(f"{path}: {got!r} != {exp!r}")
        return
    if isinstance(exp, (int, float)):
        e, g = float(exp), float(got)
        if not np.isclose(g, e, atol=tol["atol"], rtol=tol["rtol"]):
            errs.append(f"{path}: {g} != {e} "
                        f"(atol {tol['atol']}, rtol {tol['rtol']})")
        return
    errs.append(f"{path}: unsupported expected type {type(exp).__name__}")


def run_validate(model_name: str, wts: Optional[str], image: str,
                 expect: Optional[str] = None,
                 save_expected: Optional[str] = None,
                 precision: str = "fp32",
                 overrides: Optional[Dict[str, Any]] = None
                 ) -> Tuple[bool, dict]:
    """Build (or random-init) → run the task driver on `image` → compare.

    Returns (passed, report). With save_expected, writes the fixture and
    returns passed=True.
    """
    from tensorrtx_tpu.core.engine import build_engine
    from tensorrtx_tpu.core.runner import load_image
    from tensorrtx_tpu.core.tasks import run_task, task_for

    eng = build_engine(model_name, wts, precision=precision,
                       **(overrides or {}))
    img = np.asarray(load_image(image))
    task = task_for(model_name)
    if task == "detect":
        from tensorrtx_tpu.core.runner import ServingPipeline

        pipe = ServingPipeline(eng, src_h=img.shape[0], src_w=img.shape[1],
                               donate=False)
        r = pipe.detect_images([img])[0]
        result = {"detections": [
            {"box": [round(float(v), 2) for v in b],
             "score": round(float(s), 4), "class": int(c)}
            for b, s, c in zip(r["boxes"], r["scores"], r["classes"])]}
    else:
        result = run_task(eng, img)
    result = json.loads(json.dumps(result))  # normalize to JSON types

    if save_expected:
        doc = {"model": model_name, "task": task, "result": result,
               "tolerances": DEFAULT_TOL}
        with open(save_expected, "w") as f:
            json.dump(doc, f, indent=1)
        return True, {"saved": save_expected, "result": result}

    if not expect:
        return True, {"result": result,
                      "note": "no --expect given: ran build+infer only"}
    with open(expect) as f:
        doc = json.load(f)
    tol = {**DEFAULT_TOL, **doc.get("tolerances", {})}
    errs: List[str] = []
    _compare(doc["result"], result, tol, errs)
    return not errs, {"pass": not errs, "errors": errs, "result": result}
