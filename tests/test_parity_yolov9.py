"""Full-graph numeric parity for YOLOv9 t/s/m (converted DDetect graphs) and
yolov9-c (PGI dual-branch): torch reference → .wts → engine, identical
weights (upgrades the ADown-only parity in test_yolov9.py)."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from test_yolo11 import np_decode
from torch_refs.yolo11_torch import randomize
from torch_refs.yolov9_torch import (Yolov9ConvertedTorch, Yolov9CTorch,
                                     Yolov9ETorch)

H = W = 160


def _check(tm, eng, seed):
    x = np.random.default_rng(seed).uniform(0, 1, (1, 3, H, W)).astype(
        np.float32)
    with torch.no_grad():
        head = [(b.numpy(), c.numpy()) for b, c in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, exp_cls = np_decode(head)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    agree = (np.asarray(res["cls"])[0].astype(int) == exp_cls[0]).mean()
    assert agree > 0.99


@pytest.mark.parametrize("scale", ["t", "s", "m"])
def test_yolov9_converted_parity(tmp_path, scale):
    tm = randomize(Yolov9ConvertedTorch(scale=scale), seed=31).eval()
    wts = tmp_path / f"v9{scale}.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov9", str(wts), scale=scale, input_h=H, input_w=W,
                       postprocess="raw")
    _check(tm, eng, seed=32)


def test_yolov9_e_live_graph_parity(tmp_path):
    tm = randomize(Yolov9ETorch(), seed=35).eval()
    wts = tmp_path / "v9e.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov9", str(wts), scale="e", input_h=H, input_w=W,
                       postprocess="raw")
    _check(tm, eng, seed=36)


def test_yolov9_c_full_graph_parity(tmp_path):
    tm = randomize(Yolov9CTorch(), seed=33).eval()
    wts = tmp_path / "v9c.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov9", str(wts), scale="c", input_h=H, input_w=W,
                       postprocess="raw")
    _check(tm, eng, seed=34)
