"""YOLOv8 + YOLOv5 parity vs torch reference graphs (random weights)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import save_wts, state_dict_to_wts
from torch_refs.yolo11_torch import (C2f, C3, Conv, SPPF, randomize)
from test_yolo11 import np_decode

H = W = 160


class Yolov8Torch(tnn.Module):
    def __init__(self, nc=80, gd=0.33, gw=0.25, maxc=1024):
        super().__init__()
        w = lambda x: int(math.ceil(min(x, maxc) * gw / 8)) * 8
        d = lambda x: max(round(x * gd), 1)
        ch = (w(256), w(512), w(1024))
        c2h = max(16, ch[0] // 4, 64)
        c3h = max(ch[0], min(nc, 100))
        det = tnn.Module()
        det.cv2 = tnn.ModuleList(
            tnn.Sequential(Conv(x, c2h, 3), Conv(c2h, c2h, 3),
                           tnn.Conv2d(c2h, 64, 1)) for x in ch)
        det.cv3 = tnn.ModuleList(
            tnn.Sequential(Conv(x, c3h, 3), Conv(c3h, c3h, 3),
                           tnn.Conv2d(c3h, nc, 1)) for x in ch)
        self.model = tnn.ModuleList([
            Conv(3, w(64), 3, 2), Conv(w(64), w(128), 3, 2),
            C2f(w(128), w(128), d(3), True),
            Conv(w(128), w(256), 3, 2), C2f(w(256), w(256), d(6), True),
            Conv(w(256), w(512), 3, 2), C2f(w(512), w(512), d(6), True),
            Conv(w(512), w(1024), 3, 2), C2f(w(1024), w(1024), d(3), True),
            SPPF(w(1024), w(1024)),
            tnn.Upsample(scale_factor=2), tnn.Identity(),
            C2f(w(1024) + w(512), w(512), d(3), False),
            tnn.Upsample(scale_factor=2), tnn.Identity(),
            C2f(w(512) + w(256), w(256), d(3), False),
            Conv(w(256), w(256), 3, 2), tnn.Identity(),
            C2f(w(512) + w(256), w(512), d(3), False),
            Conv(w(512), w(512), 3, 2), tnn.Identity(),
            C2f(w(1024) + w(512), w(1024), d(3), False),
            det,
        ])

    def forward(self, x):
        m = self.model
        y = m[1](m[0](x))
        y = m[2](y)
        c4 = m[4](m[3](y))
        c6 = m[6](m[5](c4))
        y = m[8](m[7](c6))
        p5_in = m[9](y)
        p4m = m[12](torch.cat([m[10](p5_in), c6], 1))
        p3 = m[15](torch.cat([m[13](p4m), c4], 1))
        p4 = m[18](torch.cat([m[16](p3), p4m], 1))
        p5 = m[21](torch.cat([m[19](p4), p5_in], 1))
        det = m[22]
        return [(det.cv2[i](f), det.cv3[i](f)) for i, f in enumerate([p3, p4, p5])]


def test_yolov8_det_parity(tmp_path, rng):
    tm = randomize(Yolov8Torch(), seed=2).eval()
    wts = tmp_path / "v8n.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov8", str(wts), scale="n", input_h=H, input_w=W,
                       postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        head = [(b.numpy(), c.numpy()) for b, c in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, exp_cls = np_decode(head)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)


class Yolov5Torch(tnn.Module):
    def __init__(self, nc=80, gd=0.33, gw=0.25):
        super().__init__()
        w = lambda x: int(math.ceil(x * gw / 8)) * 8
        d = lambda x: max(round(x * gd), 1)
        no = 3 * (5 + nc)
        det = tnn.Module()
        det.m = tnn.ModuleList(tnn.Conv2d(c, no, 1) for c in
                               (w(256), w(512), w(1024)))
        self.model = tnn.ModuleList([
            Conv(3, w(64), 6, 2, p=2), Conv(w(64), w(128), 3, 2),
            C3(w(128), w(128), d(3), True),
            Conv(w(128), w(256), 3, 2), C3(w(256), w(256), d(6), True),
            Conv(w(256), w(512), 3, 2), C3(w(512), w(512), d(9), True),
            Conv(w(512), w(1024), 3, 2), C3(w(1024), w(1024), d(3), True),
            SPPF(w(1024), w(1024)),
            Conv(w(1024), w(512), 1), tnn.Upsample(scale_factor=2), tnn.Identity(),
            C3(w(1024), w(512), d(3), False),
            Conv(w(512), w(256), 1), tnn.Upsample(scale_factor=2), tnn.Identity(),
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
        return [m[24].m[i](f) for i, f in enumerate([p3, p4, p5])]


ANCHORS = np.array([[[10, 13], [16, 30], [33, 23]],
                    [[30, 61], [62, 45], [59, 119]],
                    [[116, 90], [156, 198], [373, 326]]], np.float32)


def np_decode_v5(levels, anchors, nc=80, strides=(8, 16, 32), ignore=0.1):
    boxes, confs, clss = [], [], []
    sig = lambda v: 1 / (1 + np.exp(-v))
    for li, raw in enumerate(levels):
        b, c, h, w = raw.shape
        s = strides[li]
        r = sig(raw.reshape(b, 3, 5 + nc, h, w))
        cols = np.arange(w)[None, None, None, :]
        rows = np.arange(h)[None, None, :, None]
        cx = (r[:, :, 0] * 2 - 0.5 + cols) * s
        cy = (r[:, :, 1] * 2 - 0.5 + rows) * s
        bw = (r[:, :, 2] * 2) ** 2 * anchors[li, :, 0][None, :, None, None]
        bh = (r[:, :, 3] * 2) ** 2 * anchors[li, :, 1][None, :, None, None]
        obj = r[:, :, 4]
        cls = r[:, :, 5:]
        cmax = cls.max(axis=2)
        cid = cls.argmax(axis=2)
        conf = np.where(obj >= ignore, obj * cmax, 0.0)
        bx = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        # order: rows (h,w) within each anchor k? our layout is (cell, k)
        bx = bx.transpose(0, 2, 3, 1, 4).reshape(b, -1, 4)
        confs.append(conf.transpose(0, 2, 3, 1).reshape(b, -1))
        clss.append(cid.transpose(0, 2, 3, 1).reshape(b, -1))
        boxes.append(bx)
    return (np.concatenate(boxes, 1), np.concatenate(confs, 1),
            np.concatenate(clss, 1))


def test_yolov5_det_parity(tmp_path, rng):
    tm = randomize(Yolov5Torch(), seed=4).eval()
    sd = dict(tm.state_dict())
    sd["model.24.anchor_grid"] = torch.from_numpy(ANCHORS)
    wts = tmp_path / "v5n.wts"
    state_dict_to_wts(str(wts), sd)
    eng = build_engine("yolov5", str(wts), scale="n", input_h=H, input_w=W,
                       postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        levels = [t.numpy() for t in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, exp_cls = np_decode_v5(levels, ANCHORS)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
