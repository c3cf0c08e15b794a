"""YOLO11 seg/pose/obb head parity (yolo11/src/model.cpp:509/801/1092)."""

import dataclasses
import math

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import Yolo11Torch, randomize

H = W = 160


def _build(task, tmp_path, seed):
    tm = randomize(Yolo11Torch(scale="n", nc=80 if task == "seg" else
                               (1 if task == "pose" else 15), task=task),
                   seed=seed).eval()
    wts = tmp_path / f"{task}.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    nc = {"seg": 80, "pose": 1, "obb": 15}[task]
    eng = build_engine("yolo11", str(wts), scale="n", task=task, num_classes=nc,
                       input_h=H, input_w=W, postprocess="raw")
    return tm, eng


def test_yolo11_seg_raw_parity(tmp_path, rng):
    tm, eng = _build("seg", tmp_path, 21)
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    # mask coefficients: level-major flatten of cv4 maps
    exp = np.concatenate(
        [t.numpy().reshape(1, 32, -1).transpose(0, 2, 1) for t in out["cv4"]], 1)
    np.testing.assert_allclose(np.asarray(res["extras"]), exp, atol=2e-3)
    # proto: (B, H/4, W/4, 32) NHWC vs torch NCHW; tolerance scales with the
    # activation magnitude after the deep random-weight chain
    proto = np.asarray(res["proto"])
    exp_proto = out["proto"].numpy().transpose(0, 2, 3, 1)
    tol = max(2e-3, 2e-5 * float(np.abs(exp_proto).max()))
    np.testing.assert_allclose(proto, exp_proto, atol=tol)


def test_yolo11_pose_raw_parity(tmp_path, rng):
    tm, eng = _build("pose", tmp_path, 22)
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    # reproduce keypoint decode per yololayer.cu:231-256
    strides = (8, 16, 32)
    kpt_flat = []
    for li, t in enumerate(out["cv4"]):
        kpt_flat.append(t.numpy().reshape(1, 51, -1).transpose(0, 2, 1))
    kraw = np.concatenate(kpt_flat, 1).reshape(1, -1, 17, 3)
    boxes = np.asarray(res["boxes"])
    got = np.asarray(res["extras"]).reshape(1, -1, 17, 3)
    # verify a handful of anchors against the formula
    n_lv0 = (H // 8) * (W // 8)
    cols = np.tile(np.arange(W // 8), H // 8)
    rows = np.repeat(np.arange(H // 8), W // 8)
    sig = lambda v: 1 / (1 + np.exp(-v))
    for n in rng.integers(0, n_lv0, 30):
        for k in range(17):
            kx = (kraw[0, n, k, 0] * 2 + cols[n]) * 8
            ky = (kraw[0, n, k, 1] * 2 + rows[n]) * 8
            kc = sig(kraw[0, n, k, 2])
            bx = boxes[0, n]
            inside = bx[0] <= kx <= bx[2] and bx[1] <= ky <= bx[3]
            if kc < 0.5 or not inside:
                assert got[0, n, k, 2] == -1
            else:
                np.testing.assert_allclose(got[0, n, k], [kx, ky, kc], atol=1e-2)


def test_yolo11_obb_raw_parity(tmp_path, rng):
    tm, eng = _build("obb", tmp_path, 23)
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    # angle = (sigmoid(raw) - 0.25) * pi (yololayer.cu:258-262)
    ang_flat = np.concatenate(
        [t.numpy().reshape(1, 1, -1).transpose(0, 2, 1) for t in out["cv4"]], 1)[..., 0]
    sig = lambda v: 1 / (1 + np.exp(-v))
    exp_angle = (sig(ang_flat) - 0.25) * math.pi
    np.testing.assert_allclose(np.asarray(res["extras"])[..., 0], exp_angle,
                               atol=1e-3)
    # boxes are (cx, cy, w, h): w,h must be positive
    bx = np.asarray(res["boxes"])
    assert (bx[..., 2:] >= 0).all()


def test_yolo11_seg_fused_masks(tmp_path, rng):
    tm, eng = _build("seg", tmp_path, 24)
    cfg = dataclasses.replace(eng.cfg, postprocess="nms", conf_thresh=0.01,
                              max_det=16)
    from tensorrtx_tpu.core.engine import Engine

    eng2 = Engine("yolo11", eng.params, cfg)
    x = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    out = eng2(x)
    assert out["masks"].shape == (1, 16, H // 4, W // 4)
    m = np.asarray(out["masks"])
    assert (m >= 0).all() and (m <= 1).all()
