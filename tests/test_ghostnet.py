"""GhostNet v1 parity vs a huawei-noah-layout torch reference."""

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.ghostnet import CFG, _divisible
from torch_refs.yolo11_torch import randomize


class GhostModule(tnn.Module):
    def __init__(self, inp, oup, relu=True):
        super().__init__()
        init = math.ceil(oup / 2)
        self.primary_conv = tnn.Sequential(
            tnn.Conv2d(inp, init, 1, bias=False), tnn.BatchNorm2d(init),
            tnn.ReLU(True) if relu else tnn.Identity())
        self.cheap_operation = tnn.Sequential(
            tnn.Conv2d(init, init, 3, 1, 1, groups=init, bias=False),
            tnn.BatchNorm2d(init),
            tnn.ReLU(True) if relu else tnn.Identity())

    def forward(self, x):
        y1 = self.primary_conv(x)
        return torch.cat([y1, self.cheap_operation(y1)], 1)


class GhostBottleneck(tnn.Module):
    def __init__(self, inp, mid, oup, k, s, se):
        super().__init__()
        self.s, self.k = s, k
        self.ghost1 = GhostModule(inp, mid)
        if s > 1:
            self.conv_dw = tnn.Conv2d(mid, mid, k, s, (k - 1) // 2,
                                      groups=mid, bias=False)
            self.bn_dw = tnn.BatchNorm2d(mid)
        if se > 0:
            red = _divisible(int(mid * se))
            semod = tnn.Module()
            semod.conv_reduce = tnn.Conv2d(mid, red, 1)
            semod.conv_expand = tnn.Conv2d(red, mid, 1)
            self.se = semod
        else:
            self.se = None
        self.ghost2 = GhostModule(mid, oup, relu=False)
        if inp == oup and s == 1:
            self.shortcut = None
        else:
            self.shortcut = tnn.Sequential(
                tnn.Conv2d(inp, inp, k, s, (k - 1) // 2, groups=inp, bias=False),
                tnn.BatchNorm2d(inp),
                tnn.Conv2d(inp, oup, 1, bias=False), tnn.BatchNorm2d(oup))

    def forward(self, x):
        y = self.ghost1(x)
        if self.s > 1:
            y = self.bn_dw(self.conv_dw(y))
        if self.se is not None:
            w = y.mean([2, 3], keepdim=True)
            w = self.se.conv_expand(F.relu(self.se.conv_reduce(w)))
            y = y * F.hardsigmoid(w)
        y = self.ghost2(y)
        sc = x if self.shortcut is None else self.shortcut(x)
        return y + sc


class TorchGhostNet(tnn.Module):
    def __init__(self, nc=10):
        super().__init__()
        self.conv_stem = tnn.Conv2d(3, 16, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        blocks = {}
        for (name, inp, mid, oup, k, s, se) in CFG:
            _, si, ii = name.split(".")
            blocks.setdefault(si, {})[ii] = GhostBottleneck(inp, mid, oup, k, s, se)
        bl = {}
        for si, d in blocks.items():
            bl[si] = tnn.Sequential(*[d[str(i)] for i in range(len(d))])
        final = tnn.Module()
        final.conv = tnn.Conv2d(160, 960, 1, bias=False)
        final.bn1 = tnn.BatchNorm2d(960)
        bl["9"] = tnn.Sequential(final)
        self.blocks = tnn.ModuleDict(bl)
        self.conv_head = tnn.Conv2d(960, 1280, 1)
        self.classifier = tnn.Linear(1280, nc)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv_stem(x)))
        for si in [str(i) for i in range(9)]:
            y = self.blocks[si](y)
        f = self.blocks["9"][0]
        y = F.relu(f.bn1(f.conv(y)))
        y = F.adaptive_avg_pool2d(y, 1)
        y = F.relu(self.conv_head(y))
        return self.classifier(y.flatten(1))


def test_ghostnet_parity(tmp_path, rng):
    tm = randomize(TorchGhostNet(), seed=81).eval()
    wts = tmp_path / "gn.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("ghostnet", str(wts), num_classes=10,
                       input_h=128, input_w=160)
    x = rng.uniform(-1, 1, (1, 3, 128, 160)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
