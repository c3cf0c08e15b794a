"""Detector matrix: the task/scale variants the reference ships per model
(yolov8 cls/pose/obb/p2/5u, yolov5 cls/seg, yolo26 cls/obb, yolov9 t/s/m,
yolov3-tiny, yolov12 cls/seg, yolov10 NMS-free graph).

Every variant combo is held to a committed fixed-seed output digest
(tools/goldens.py MATRIX → tests/goldens.json) — shape asserts alone would
miss a numerics regression in combinations the per-model parity tests don't
pin. Behavioral contracts (NMS-free ordering, two-level anchor counts) are
asserted separately below.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.tools.goldens import (GOLDEN_PATH, MATRIX, assert_matches,
                                         compute_golden)


def _goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("tests/goldens.json not generated")
    return json.load(open(GOLDEN_PATH))


@pytest.mark.parametrize("key", sorted(MATRIX))
def test_matrix_variant_digest(key):
    goldens = _goldens()
    if key not in goldens:
        pytest.skip(f"no golden recorded for {key} — run "
                    f"`python -m tensorrtx_tpu.tools.goldens {key}`")
    assert_matches(compute_golden(key), goldens[key], ctx=key)


def _run(name, rng, **kw):
    m = get_model(name)
    cfg = dataclasses.replace(m.default_cfg(), **kw)
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, cfg.input_h, cfg.input_w, 3)).astype(
        np.float32)
    return jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x), cfg


def test_yolov10_is_nms_free(rng):
    """v10 contract: top-k gather, no IoU suppression — every kept slot is
    simply the k-th highest-confidence candidate (yololayer.cu:157)."""
    out, cfg = _run("yolov10", rng, input_h=320, input_w=320)
    scores = np.asarray(out["scores"])[0]
    valid = np.asarray(out["valid"])[0]
    s = scores[valid.astype(bool)]
    assert (np.diff(s) <= 1e-6).all()  # sorted by confidence
    assert out["boxes"].shape == (1, cfg.max_det, 4)


def test_yolov3_tiny_two_level_anchor_decode(rng):
    out, cfg = _run("yolov3-tiny", rng, input_h=416, input_w=416,
                    postprocess="raw")
    n = (416 // 32) ** 2 * 3 + (416 // 16) ** 2 * 3
    assert out["boxes"].shape == (1, n, 4)


def test_seg_and_pose_output_contracts(rng):
    """The extras/masks buffer contract the serving layer presents on
    (core/tasks.py): pose extras = 17*3 keypoints, seg extras = 32 mask
    coefficients + prototype tensor aligned to max_det."""
    out, cfg = _run("yolov8", rng, task="pose", input_h=320, input_w=320)
    assert out["extras"].shape == (1, cfg.max_det, 51)
    out, cfg = _run("yolov5", rng, task="seg", input_h=320, input_w=320)
    assert out["extras"].shape == (1, cfg.max_det, 32)
    assert out["masks"].shape[1] == cfg.max_det
