"""Numeric parity for YOLOv12 det/seg/pose: full torch graph → .wts → engine
(identical weights). Covers the yolov12-tubro seg/pose mains (VERDICT r2 #8
— pose cfg path) beyond the block-level parity in test_yolov12.py."""

import numpy as np
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from test_parity_v8_variants import np_decode_pose
from test_yolo11 import np_decode
from torch_refs.yolo11_torch import randomize
from torch_refs.yolov12_torch import Yolov12Torch

H = W = 160


def _pair(tmp_path, seed, task="det", **kw):
    tm = randomize(Yolov12Torch(task=task, nc=kw.get("num_classes", 80)),
                   seed=seed).eval()
    wts = tmp_path / "v12.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov12", str(wts), scale="n", task=task,
                       input_h=H, input_w=W, postprocess="raw", **kw)
    x = np.random.default_rng(seed).uniform(0, 1, (1, 3, H, W)).astype(
        np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    return out, res


def test_yolov12_det_parity(tmp_path):
    out, res = _pair(tmp_path, seed=21)
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, exp_cls = np_decode(head)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    agree = (np.asarray(res["cls"])[0].astype(int) == exp_cls[0]).mean()
    assert agree > 0.99


def test_yolov12_seg_parity(tmp_path):
    out, res = _pair(tmp_path, seed=22, task="seg")
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, _ = np_decode(head)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    coefs = []
    for t in out["cv4"]:
        a = t.numpy()
        b, c, gh, gw = a.shape
        coefs.append(a.reshape(b, c, gh * gw).transpose(0, 2, 1))
    np.testing.assert_allclose(np.asarray(res["extras"]),
                               np.concatenate(coefs, 1), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res["proto"]).transpose(0, 3, 1, 2), out["proto"].numpy(),
        atol=2e-3)


def test_yolov12_pose_parity(tmp_path):
    out, res = _pair(tmp_path, seed=23, task="pose", num_classes=1)
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, _ = np_decode(head, nc=1)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    cv4 = [t.numpy() for t in out["cv4"]]
    exp_kpts = np_decode_pose(cv4, exp_boxes)
    got = np.asarray(res["extras"])
    both = (exp_kpts != -1.0) & (got != -1.0)
    np.testing.assert_allclose(got[both], exp_kpts[both], atol=0.1)
    assert ((exp_kpts == -1.0) == (got == -1.0)).mean() > 0.999
