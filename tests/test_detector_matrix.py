"""Detector matrix: the task/scale variants the reference ships per model
(yolov8 cls/pose/obb/p2/5u, yolov5 cls/seg, yolo26 cls/obb, yolov9 t/s/m,
yolov3-tiny, yolov12 cls/seg, yolov10 NMS-free graph) all build and run
with the right output contracts."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _run(name, rng, **kw):
    m = get_model(name)
    cfg = dataclasses.replace(m.default_cfg(), **kw)
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, cfg.input_h, cfg.input_w, 3)).astype(
        np.float32)
    return jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x), cfg


CLS_CASES = [
    ("yolov8", {"task": "cls", "input_h": 224, "input_w": 224}),
    ("yolov5", {"task": "cls", "input_h": 224, "input_w": 224}),
    ("yolo26", {"task": "cls", "input_h": 224, "input_w": 224}),
    ("yolov12", {"task": "cls", "input_h": 256, "input_w": 256}),
]


@pytest.mark.parametrize("name,kw", CLS_CASES)
def test_cls_variants(rng, name, kw):
    out, cfg = _run(name, rng, **kw)
    assert out.shape == (1, cfg.num_classes)
    assert np.isfinite(np.asarray(out)).all()


DET_CASES = [
    ("yolov10", {"input_h": 320, "input_w": 320}),
    ("yolov3-tiny", {"input_h": 416, "input_w": 416}),
    ("yolov8", {"variant": "p2", "input_h": 320, "input_w": 320}),
    ("yolov8", {"variant": "5u", "input_h": 320, "input_w": 320}),
    ("yolov9", {"scale": "t", "input_h": 320, "input_w": 320}),
    ("yolov9", {"scale": "s", "input_h": 320, "input_w": 320}),
    ("yolov9", {"scale": "m", "input_h": 320, "input_w": 320}),
]


@pytest.mark.parametrize("name,kw", DET_CASES)
def test_det_variants(rng, name, kw):
    out, cfg = _run(name, rng, **kw)
    assert out["boxes"].shape == (1, cfg.max_det, 4)
    assert out["count"].shape == (1,)


EXTRA_CASES = [
    ("yolov8", {"task": "pose", "input_h": 320, "input_w": 320}, 51),
    ("yolov8", {"task": "obb", "input_h": 320, "input_w": 320}, 1),
    ("yolo26", {"task": "obb", "input_h": 320, "input_w": 320}, 1),
    ("yolov5", {"task": "seg", "input_h": 320, "input_w": 320}, 32),
    ("yolov12", {"task": "seg", "input_h": 320, "input_w": 320}, 32),
]


@pytest.mark.parametrize("name,kw,edim", EXTRA_CASES)
def test_extras_variants(rng, name, kw, edim):
    out, cfg = _run(name, rng, **kw)
    assert out["extras"].shape == (1, cfg.max_det, edim)
    if kw["task"] == "seg":
        assert out["masks"].shape[1] == cfg.max_det


def test_yolov10_is_nms_free(rng):
    """v10 contract: top-k gather, no IoU suppression — every kept slot is
    simply the k-th highest-confidence candidate (yololayer.cu:157)."""
    out, cfg = _run("yolov10", rng, input_h=320, input_w=320)
    scores = np.asarray(out["scores"])[0]
    valid = np.asarray(out["valid"])[0]
    s = scores[valid.astype(bool)]
    assert (np.diff(s) <= 1e-6).all()  # sorted by confidence


def test_yolov3_tiny_two_level_anchor_decode(rng):
    out, cfg = _run("yolov3-tiny", rng, input_h=416, input_w=416,
                    postprocess="raw")
    n = (416 // 32) ** 2 * 3 + (416 // 16) ** 2 * 3
    assert out["boxes"].shape == (1, n, 4)
