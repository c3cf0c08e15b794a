"""DB geometry ops + DBNet model parity."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.ops.db import convex_hull, db_boxes_from_prob, min_area_rect
from torch_refs.yolo11_torch import randomize


def test_min_area_rect_axis_aligned():
    pts = np.array([[1, 1], [5, 1], [5, 3], [1, 3], [3, 2]], float)
    c, (w, h), th = min_area_rect(pts)
    np.testing.assert_allclose(c, [3, 2], atol=1e-6)
    assert sorted([round(w, 4), round(h, 4)]) == [2.0, 4.0]


def test_min_area_rect_rotated(rng):
    # random rotated rectangle point cloud: recovered area ≈ true area
    theta = 0.63
    c, s = math.cos(theta), math.sin(theta)
    base = rng.uniform(0, 1, (200, 2)) * [8, 3]
    pts = base @ np.array([[c, s], [-s, c]]) + [10, 20]
    _, (w, h), _ = min_area_rect(pts)
    assert abs(w * h - 24) / 24 < 0.15


def test_db_boxes_synthetic():
    prob = np.zeros((100, 200), np.float32)
    prob[20:40, 30:120] = 0.95   # one strong text region
    prob[60:65, 150:160] = 0.4   # weak region below box_thresh
    boxes = db_boxes_from_prob(prob, bin_thresh=0.3, box_thresh=0.7)
    assert len(boxes) == 1
    box, score = boxes[0]
    assert score > 0.9
    xs, ys = box[:, 0], box[:, 1]
    # unclipped box should cover the region with margin
    assert xs.min() < 30 and xs.max() > 120
    assert ys.min() < 20 and ys.max() > 40


class TorchDBNet(tnn.Module):
    """WenmuZhou/DBNet.pytorch resnet18-FPN layout (binarize head only)."""

    def __init__(self):
        super().__init__()
        from torch_refs.resnet_torch import BasicBlock

        class Backbone(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
                self.bn1 = tnn.BatchNorm2d(64)
                mk = lambda ci, co, s: tnn.Sequential(
                    BasicBlock(ci, co, s, tnn.Sequential(
                        tnn.Conv2d(ci, co, 1, s, bias=False), tnn.BatchNorm2d(co))
                        if (s != 1 or ci != co) else None),
                    BasicBlock(co, co))
                self.layer1 = mk(64, 64, 1)
                self.layer2 = mk(64, 128, 2)
                self.layer3 = mk(128, 256, 2)
                self.layer4 = mk(256, 512, 2)

            def forward(self, x):
                y = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
                c2 = self.layer1(y)
                c3 = self.layer2(c2)
                c4 = self.layer3(c3)
                c5 = self.layer4(c4)
                return c2, c3, c4, c5

        def cbr(ci, co, k):
            return tnn.Sequential()

        class ConvBnRelu(tnn.Module):
            def __init__(self, ci, co, k):
                super().__init__()
                self.conv = tnn.Conv2d(ci, co, k, padding=k // 2, bias=False)
                self.bn = tnn.BatchNorm2d(co)

            def forward(self, x):
                return F.relu(self.bn(self.conv(x)))

        class Neck(tnn.Module):
            def __init__(self):
                super().__init__()
                self.reduce_conv_c2 = ConvBnRelu(64, 64, 1)
                self.reduce_conv_c3 = ConvBnRelu(128, 64, 1)
                self.reduce_conv_c4 = ConvBnRelu(256, 64, 1)
                self.reduce_conv_c5 = ConvBnRelu(512, 64, 1)
                self.smooth_p4 = ConvBnRelu(64, 64, 3)
                self.smooth_p3 = ConvBnRelu(64, 64, 3)
                self.smooth_p2 = ConvBnRelu(64, 64, 3)
                self.conv = tnn.Sequential(
                    tnn.Conv2d(256, 256, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(256), tnn.ReLU(True))

            def forward(self, c2, c3, c4, c5):
                up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
                p5 = self.reduce_conv_c5(c5)
                p4 = self.smooth_p4(self.reduce_conv_c4(c4) + up(p5))
                p3 = self.smooth_p3(self.reduce_conv_c3(c3) + up(p4))
                p2 = self.smooth_p2(self.reduce_conv_c2(c2) + up(p3))
                cat = torch.cat([
                    p2, up(p3),
                    F.interpolate(p4, scale_factor=4, mode="nearest"),
                    F.interpolate(p5, scale_factor=8, mode="nearest")], 1)
                return self.conv(cat)

        class Head(tnn.Module):
            def __init__(self):
                super().__init__()
                self.binarize = tnn.Sequential(
                    tnn.Conv2d(256, 64, 3, padding=1, bias=False),
                    tnn.BatchNorm2d(64), tnn.ReLU(True),
                    tnn.ConvTranspose2d(64, 64, 2, 2),
                    tnn.BatchNorm2d(64), tnn.ReLU(True),
                    tnn.ConvTranspose2d(64, 1, 2, 2),
                    tnn.Sigmoid())

            def forward(self, x):
                return self.binarize(x)

        self.backbone = Backbone()
        self.neck = Neck()
        self.head = Head()

    def forward(self, x):
        return self.head(self.neck(*self.backbone(x)))


def test_dbnet_parity(tmp_path, rng):
    tm = randomize(TorchDBNet(), seed=41).eval()
    wts = tmp_path / "db.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("dbnet", str(wts), input_h=64, input_w=96)
    x = rng.uniform(-1, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    assert got.shape == (1, 64, 96, 1)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=2e-3)
