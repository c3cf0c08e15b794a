"""Deterministic tensor-dump parity harness.

Reference: ppocrv5/ppocrv5_dump.cpp — `ppocrv5_dump -d engine shape prefix
[input.bin]` writes deterministic input/output dumps so engine outputs can
be diffed against the source framework ("all 14 tensor-parity models PASS",
ppocrv5/README.md:449-476). SURVEY.md §4 names this the test pattern worth
keeping.

Ours: `dump run` executes a registry model on a deterministic synthetic
input (or a provided .npy) and writes an .npz + manifest JSON;
`dump compare` diffs two dumps with max-abs / cosine thresholds.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional

import numpy as np


def _synthetic_input(shape, seed: int = 1234) -> np.ndarray:
    """Deterministic pseudo-image: fixed-seed PCG — identical across hosts."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32)


def _checksum(a: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(a).tobytes()).hexdigest()[:16]


def run_dump(model_name: str, out_prefix: str, wts: Optional[str] = None,
             input_npy: Optional[str] = None, seed: int = 1234,
             **cfg_overrides) -> dict:
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.registry import get_model

    model = get_model(model_name)
    cfg = model.default_cfg()
    if cfg_overrides:
        cfg = dataclasses.replace(cfg, **cfg_overrides)
    if wts:
        from tensorrtx_tpu.core.params import WeightMap
        from tensorrtx_tpu.core.wts import load_wts

        wm = WeightMap(load_wts(wts))
    else:
        from tensorrtx_tpu.core.random_weights import RandomWeightMap

        wm = RandomWeightMap(seed=0)
    params = jax.tree.map(jnp.asarray, model.build_params(wm, cfg))

    if input_npy:
        x = np.load(input_npy)
    else:
        shape = (1,) + tuple(model.input_shape(cfg))
        x = _synthetic_input(shape, seed)

    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, jnp.asarray(x))
    leaves = jax.tree.leaves_with_path(out)
    tensors = {"input": x}
    manifest = {"model": model_name, "seed": seed, "wts": wts,
                "input": {"shape": list(x.shape), "dtype": str(x.dtype),
                          "sha256_16": _checksum(x)},
                "outputs": {}}
    for path, leaf in leaves:
        key = "out" + "".join(str(p) for p in path)
        key = key.replace("[", "_").replace("]", "").replace("'", "")
        a = np.asarray(leaf)
        tensors[key] = a
        manifest["outputs"][key] = {"shape": list(a.shape),
                                    "dtype": str(a.dtype),
                                    "sha256_16": _checksum(a)}
    os.makedirs(os.path.dirname(out_prefix) or ".", exist_ok=True)
    np.savez(out_prefix + ".npz", **tensors)
    with open(out_prefix + ".json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def compare_dumps(prefix_a: str, prefix_b: str, max_abs: float = 0.2,
                  min_cosine: float = 0.999) -> dict:
    """Diff two dumps; PASS iff every shared tensor is within thresholds
    (the reference records matched_max_abs per model, README:449-476)."""
    a = np.load(prefix_a + ".npz")
    b = np.load(prefix_b + ".npz")
    report = {"pass": True, "tensors": {}}
    for key in sorted(set(a.files) & set(b.files)):
        ta, tb = a[key], b[key]
        entry = {"shape_a": list(ta.shape), "shape_b": list(tb.shape)}
        if ta.shape != tb.shape:
            entry["status"] = "SHAPE_MISMATCH"
            report["pass"] = False
        elif ta.dtype.kind == "f":
            fa, fb = ta.ravel().astype(np.float64), tb.ravel().astype(
                np.float64)
            entry["max_abs"] = float(np.abs(fa - fb).max()) if fa.size else 0.0
            denom = np.linalg.norm(fa) * np.linalg.norm(fb)
            entry["cosine"] = float(fa @ fb / denom) if denom > 0 else 1.0
            ok = entry["max_abs"] <= max_abs and entry["cosine"] >= min_cosine
            entry["status"] = "PASS" if ok else "FAIL"
            report["pass"] &= ok
        else:
            same = bool(np.array_equal(ta, tb))
            entry["status"] = "PASS" if same else "FAIL"
            report["pass"] &= same
        report["tensors"][key] = entry
    missing = set(a.files) ^ set(b.files)
    if missing:
        report["pass"] = False
        report["missing"] = sorted(missing)
    return report
