"""Numeric parity: scaled-yolov4 CSP and yolov5-lite full graphs
(torch reference → .wts → engine, identical weights)."""

import numpy as np
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.scaled_yolov4 import ANCHORS as V4_ANCHORS
from test_yolov8_v5 import ANCHORS as V5_ANCHORS
from test_yolov8_v5 import np_decode_v5
from torch_refs.scaled_yolov4_torch import ScaledYolov4Torch
from torch_refs.yolo11_torch import randomize
from torch_refs.yolov5_lite_torch import Yolov5LiteTorch


def _compare(eng, tm, anchors, h, w, seed):
    x = np.random.default_rng(seed).uniform(0, 1, (1, 3, h, w)).astype(
        np.float32)
    with torch.no_grad():
        levels = [t.numpy() for t in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, _ = np_decode_v5(levels, anchors)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.15)


def test_scaled_yolov4_parity(tmp_path):
    tm = randomize(ScaledYolov4Torch(), seed=61).eval()
    wts = tmp_path / "v4csp.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("scaled-yolov4", str(wts), input_h=256, input_w=256,
                       postprocess="raw")
    _compare(eng, tm, V4_ANCHORS, 256, 256, seed=62)


def test_yolov5_lite_parity(tmp_path):
    tm = randomize(Yolov5LiteTorch(), seed=63).eval()
    sd = dict(tm.state_dict())
    sd["model.21.anchor_grid"] = torch.from_numpy(V5_ANCHORS)
    wts = tmp_path / "v5lite.wts"
    state_dict_to_wts(str(wts), sd)
    eng = build_engine("yolov5-lite", str(wts), input_h=256, input_w=256,
                       postprocess="raw")
    _compare(eng, tm, V5_ANCHORS, 256, 256, seed=64)
