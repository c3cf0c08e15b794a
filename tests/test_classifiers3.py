"""SE-ResNet50, EfficientNet-b0, MLP parity."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import save_wts, state_dict_to_wts
from torch_refs.yolo11_torch import randomize


def test_mlp(tmp_path, rng):
    w = rng.normal(0, 1, (1, 1)).astype(np.float32)
    b = rng.normal(0, 1, 1).astype(np.float32)
    save_wts(str(tmp_path / "mlp.wts"), {"linear.weight": w, "linear.bias": b})
    eng = build_engine("mlp", str(tmp_path / "mlp.wts"))
    x = rng.normal(0, 1, (4, 1)).astype(np.float32)
    got = np.asarray(eng(x))
    np.testing.assert_allclose(got, x @ w.T + b, atol=1e-6)


class SEBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride=1, downsample=None, reduction=16):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        c = planes * 4
        self.se = tnn.Module()
        self.se.fc = tnn.Sequential(tnn.Linear(c, c // reduction),
                                    tnn.ReLU(True), tnn.Linear(c // reduction, c),
                                    tnn.Sigmoid())
        # rename fc.3 index: Sequential gives fc.0 fc.1 fc.2 fc.3 — want fc.0/fc.2
        self.se.fc = tnn.Sequential(tnn.Linear(c, c // reduction), tnn.ReLU(True),
                                    tnn.Linear(c // reduction, c))
        self.downsample = downsample

    def forward(self, x):
        idt = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        w = y.mean([2, 3])
        w = torch.sigmoid(self.se.fc(w))
        y = y * w[:, :, None, None]
        if self.downsample is not None:
            idt = self.downsample(x)
        return F.relu(y + idt)


class TorchSEResNet50(tnn.Module):
    def __init__(self, nc=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        inp = 64
        for li, n in enumerate((3, 4, 6, 3)):
            planes = 64 * 2 ** li
            blocks = []
            for bi in range(n):
                s = (1 if li == 0 else 2) if bi == 0 else 1
                down = None
                if bi == 0:
                    down = tnn.Sequential(
                        tnn.Conv2d(inp, planes * 4, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * 4))
                blocks.append(SEBottleneck(inp, planes, s, down))
                inp = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(2048, nc)

    def forward(self, x):
        y = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        return self.fc(y.mean([2, 3]))


def test_se_resnet50(tmp_path, rng):
    tm = randomize(TorchSEResNet50(), seed=43).eval()
    wts = tmp_path / "se.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("senet", str(wts), num_classes=10, input_h=64, input_w=64)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


def same_pad(x, k, s):
    ih, iw = x.shape[2:]
    ph = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pw = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class MBConv(tnn.Module):
    def __init__(self, cin, cout, k, s, e):
        super().__init__()
        hid = cin * e
        self.k, self.s, self.e = k, s, e
        if e != 1:
            self._expand_conv = tnn.Conv2d(cin, hid, 1, bias=False)
            self._bn0 = tnn.BatchNorm2d(hid, eps=1e-3)
        self._depthwise_conv = tnn.Conv2d(hid, hid, k, s, groups=hid, bias=False)
        self._bn1 = tnn.BatchNorm2d(hid, eps=1e-3)
        cse = max(1, int(cin * 0.25))
        self._se_reduce = tnn.Conv2d(hid, cse, 1)
        self._se_expand = tnn.Conv2d(cse, hid, 1)
        self._project_conv = tnn.Conv2d(hid, cout, 1, bias=False)
        self._bn2 = tnn.BatchNorm2d(cout, eps=1e-3)
        self.skip = s == 1 and cin == cout

    def forward(self, x):
        sw = lambda v: v * torch.sigmoid(v)
        inp = x
        if self.e != 1:
            x = sw(self._bn0(self._expand_conv(x)))
        x = sw(self._bn1(self._depthwise_conv(same_pad(x, self.k, self.s))))
        se = x.mean([2, 3], keepdim=True)
        se = torch.sigmoid(self._se_expand(sw(self._se_reduce(se))))
        x = x * se
        x = self._bn2(self._project_conv(x))
        return x + inp if self.skip else x


class TorchEffNetB0(tnn.Module):
    def __init__(self, nc=10):
        super().__init__()
        self._conv_stem = tnn.Conv2d(3, 32, 3, 2, bias=False)
        self._bn0 = tnn.BatchNorm2d(32, eps=1e-3)
        args = [(1, 3, 1, 1, 32, 16), (2, 3, 2, 6, 16, 24), (2, 5, 2, 6, 24, 40),
                (3, 3, 2, 6, 40, 80), (3, 5, 1, 6, 80, 112),
                (4, 5, 2, 6, 112, 192), (1, 3, 1, 6, 192, 320)]
        blocks = []
        for (r, k, s, e, ci, co) in args:
            for rep in range(r):
                blocks.append(MBConv(ci if rep == 0 else co, co, k,
                                     s if rep == 0 else 1, e))
        self._blocks = tnn.ModuleList(blocks)
        self._conv_head = tnn.Conv2d(320, 1280, 1, bias=False)
        self._bn1 = tnn.BatchNorm2d(1280, eps=1e-3)
        self._fc = tnn.Linear(1280, nc)

    def forward(self, x):
        sw = lambda v: v * torch.sigmoid(v)
        x = sw(self._bn0(self._conv_stem(same_pad(x, 3, 2))))
        for b in self._blocks:
            x = b(x)
        x = sw(self._bn1(self._conv_head(x)))
        return self._fc(x.mean([2, 3]))


def test_efficientnet_b0(tmp_path, rng):
    tm = randomize(TorchEffNetB0(), seed=45).eval()
    wts = tmp_path / "eff.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("efficientnet", str(wts), variant="b0", num_classes=10,
                       input_h=96, input_w=96)
    x = rng.uniform(-1, 1, (1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
