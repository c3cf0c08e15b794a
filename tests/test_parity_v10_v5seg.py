"""Numeric parity: yolov10 full graph (NMS-free head) and yolov5-seg
(anchor-based head + 32 mask coefficients + Proto)."""

import math

import numpy as np
import torch
import torch.nn as tnn

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from test_yolo11 import np_decode
from test_yolov8_v5 import ANCHORS, np_decode_v5
from torch_refs.yolo11_torch import C3, Conv, SPPF, randomize
from torch_refs.yolov10_torch import Yolov10Torch

H = W = 160


def test_yolov10_parity(tmp_path, rng):
    tm = randomize(Yolov10Torch(), seed=51).eval()
    wts = tmp_path / "v10n.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov10", str(wts), scale="n", input_h=H, input_w=W,
                       postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        head = [(b.numpy(), c.numpy()) for b, c in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, exp_cls = np_decode(head)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    agree = (np.asarray(res["cls"])[0].astype(int) == exp_cls[0]).mean()
    assert agree > 0.99


class Yolov5SegTorch(tnn.Module):
    """v5n-seg: det head m convs emit 3*(5+nc+32) + proto from p3
    (build_seg_engine, yolov5/src/model.cpp:539-618)."""

    def __init__(self, nc=80, gd=0.33, gw=0.25):
        super().__init__()
        w = lambda x: int(math.ceil(x * gw / 8)) * 8
        d = lambda x: max(round(x * gd), 1)
        no = 3 * (5 + nc + 32)
        det = tnn.Module()
        det.m = tnn.ModuleList(tnn.Conv2d(c, no, 1) for c in
                               (w(256), w(512), w(1024)))

        class Proto(tnn.Module):
            def __init__(self, c1, c_, c2):
                super().__init__()
                self.cv1 = Conv(c1, c_, k=3)
                self.upsample = tnn.Upsample(scale_factor=2, mode="nearest")
                self.cv2 = Conv(c_, c_, k=3)
                self.cv3 = Conv(c_, c2)

            def forward(self, x):
                return self.cv3(self.cv2(self.upsample(self.cv1(x))))

        det.proto = Proto(w(256), w(256), 32)
        self.model = tnn.ModuleList([
            Conv(3, w(64), 6, 2, p=2), Conv(w(64), w(128), 3, 2),
            C3(w(128), w(128), d(3), True),
            Conv(w(128), w(256), 3, 2), C3(w(256), w(256), d(6), True),
            Conv(w(256), w(512), 3, 2), C3(w(512), w(512), d(9), True),
            Conv(w(512), w(1024), 3, 2), C3(w(1024), w(1024), d(3), True),
            SPPF(w(1024), w(1024)),
            Conv(w(1024), w(512), 1), tnn.Upsample(scale_factor=2),
            tnn.Identity(),
            C3(w(1024), w(512), d(3), False),
            Conv(w(512), w(256), 1), tnn.Upsample(scale_factor=2),
            tnn.Identity(),
            C3(w(512), w(256), d(3), False),
            Conv(w(256), w(256), 3, 2), tnn.Identity(),
            C3(w(512), w(512), d(3), False),
            Conv(w(512), w(512), 3, 2), tnn.Identity(),
            C3(w(1024), w(1024), d(3), False),
            det,
        ])

    def forward(self, x):
        m = self.model
        y = m[2](m[1](m[0](x)))
        c4 = m[4](m[3](y))
        c6 = m[6](m[5](c4))
        y = m[9](m[8](m[7](c6)))
        p5i = m[10](y)
        y = m[13](torch.cat([m[11](p5i), c6], 1))
        p4i = m[14](y)
        p3 = m[17](torch.cat([m[15](p4i), c4], 1))
        p4 = m[20](torch.cat([m[18](p3), p4i], 1))
        p5 = m[23](torch.cat([m[21](p4), p5i], 1))
        det = m[24]
        return ([det.m[i](f) for i, f in enumerate([p3, p4, p5])],
                det.proto(p3))


def test_yolov5_seg_parity(tmp_path, rng):
    tm = randomize(Yolov5SegTorch(), seed=52).eval()
    sd = dict(tm.state_dict())
    sd["model.24.anchor_grid"] = torch.from_numpy(ANCHORS)
    wts = tmp_path / "v5nseg.wts"
    state_dict_to_wts(str(wts), sd)
    eng = build_engine("yolov5", str(wts), scale="n", task="seg",
                       input_h=H, input_w=W, postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        levels, proto = tm(torch.from_numpy(x))
    levels = [t.numpy() for t in levels]
    # boxes/conf via the 5+nc slots (np_decode_v5 reads the leading 5+nc of
    # each anchor block)
    nc, nm = 80, 32
    lead = []
    coefs = []
    for raw in levels:
        b, c, h, w = raw.shape
        r = raw.reshape(b, 3, 5 + nc + nm, h, w)
        lead.append(r[:, :, :5 + nc].reshape(b, 3 * (5 + nc), h, w))
        coefs.append(r[:, :, 5 + nc:].transpose(0, 3, 4, 1, 2).reshape(
            b, -1, nm))
    exp_boxes, exp_conf, _ = np_decode_v5(lead, ANCHORS, nc=nc)
    exp_coef = np.concatenate(coefs, 1)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    np.testing.assert_allclose(np.asarray(res["extras"]), exp_coef, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(res["proto"]).transpose(0, 3, 1, 2), proto.numpy(),
        atol=2e-3)
