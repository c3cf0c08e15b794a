"""HRNet-w18-small-v2 cls parity vs an official-layout torch reference."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.hrnet import HEAD_PLANES, VARIANTS
from torch_refs.resnet_torch import Bottleneck as TVBottleneck
from torch_refs.yolo11_torch import randomize


class BasicBlock(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = tnn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(ch)
        self.conv2 = tnn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(x + y)


class HRModule(tnn.Module):
    def __init__(self, chans, n_blocks):
        super().__init__()
        nb = len(chans)
        self.nb = nb
        self.branches = tnn.ModuleList(
            tnn.Sequential(*[BasicBlock(c) for _ in range(n_blocks)])
            for c in chans)
        fuse = []
        for i in range(nb):
            row = []
            for j in range(nb):
                if i == j:
                    row.append(tnn.Identity())
                elif j > i:
                    row.append(tnn.Sequential(
                        tnn.Conv2d(chans[j], chans[i], 1, bias=False),
                        tnn.BatchNorm2d(chans[i])))
                else:
                    steps = []
                    for k in range(i - j):
                        co = chans[i] if k == i - j - 1 else chans[j]
                        seq = [tnn.Conv2d(chans[j], co, 3, 2, 1, bias=False),
                               tnn.BatchNorm2d(co)]
                        if k != i - j - 1:
                            seq.append(tnn.ReLU(False))
                        steps.append(tnn.Sequential(*seq))
                    row.append(tnn.Sequential(*steps))
            fuse.append(tnn.ModuleList(row))
        self.fuse_layers = tnn.ModuleList(fuse)

    def forward(self, xs):
        ys = [b(x) for b, x in zip(self.branches, xs)]
        outs = []
        for i in range(self.nb):
            acc = ys[i]
            for j in range(self.nb):
                if i == j:
                    continue
                t = self.fuse_layers[i][j](ys[j])
                if j > i:
                    t = F.interpolate(t, scale_factor=2 ** (j - i),
                                      mode="nearest")
                acc = acc + t
            outs.append(F.relu(acc))
        return outs


class TorchHRNet(tnn.Module):
    def __init__(self, nc=10, variant="w18_small_v2"):
        super().__init__()
        mods, chans, blocks = VARIANTS[variant]
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        mk_bneck = lambda cin, planes, down: TVBottleneck(
            cin, planes, 1,
            tnn.Sequential(tnn.Conv2d(cin, planes * 4, 1, bias=False),
                           tnn.BatchNorm2d(planes * 4)) if down else None)
        self.layer1 = tnn.Sequential(mk_bneck(64, 64, True),
                                     mk_bneck(256, 64, False))
        self.transition1 = tnn.ModuleList([
            tnn.Sequential(tnn.Conv2d(256, chans[0][0], 3, 1, 1, bias=False),
                           tnn.BatchNorm2d(chans[0][0]), tnn.ReLU(False)),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(256, chans[0][1], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(chans[0][1]), tnn.ReLU(False)))])
        self.stage2 = tnn.Sequential(*[HRModule(chans[0], blocks[0])
                                       for _ in range(mods[0])])
        self.transition2 = tnn.ModuleList([
            tnn.Identity(), tnn.Identity(),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(chans[0][-1], chans[1][2], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(chans[1][2]), tnn.ReLU(False)))])
        self.stage3 = tnn.Sequential(*[HRModule(chans[1], blocks[1])
                                       for _ in range(mods[1])])
        self.transition3 = tnn.ModuleList([
            tnn.Identity(), tnn.Identity(), tnn.Identity(),
            tnn.Sequential(tnn.Sequential(
                tnn.Conv2d(chans[1][-1], chans[2][3], 3, 2, 1, bias=False),
                tnn.BatchNorm2d(chans[2][3]), tnn.ReLU(False)))])
        self.stage4 = tnn.Sequential(*[HRModule(chans[2], blocks[2])
                                       for _ in range(mods[2])])
        self.incre_modules = tnn.ModuleList(
            tnn.Sequential(mk_bneck(chans[2][i], HEAD_PLANES[i], True))
            for i in range(4))
        self.downsamp_modules = tnn.ModuleList(
            tnn.Sequential(tnn.Conv2d(HEAD_PLANES[i] * 4,
                                      HEAD_PLANES[i + 1] * 4, 3, 2, 1),
                           tnn.BatchNorm2d(HEAD_PLANES[i + 1] * 4),
                           tnn.ReLU(False))
            for i in range(3))
        self.final_layer = tnn.Sequential(tnn.Conv2d(1024, 2048, 1),
                                          tnn.BatchNorm2d(2048), tnn.ReLU(False))
        self.classifier = tnn.Linear(2048, nc)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.layer1(y)
        xs = [self.transition1[0](y), self.transition1[1](y)]
        for stage, trans in ((self.stage2, self.transition2),
                             (self.stage3, self.transition3),
                             (self.stage4, None)):
            for mod in stage:
                xs = mod(xs)
            if trans is not None:
                xs = xs + [trans[-1](xs[-1])]
        y = self.incre_modules[0](xs[0])
        for i in range(3):
            y = self.incre_modules[i + 1](xs[i + 1]) + self.downsamp_modules[i](y)
        y = self.final_layer(y)
        y = F.adaptive_avg_pool2d(y, 1).flatten(1)
        return self.classifier(y)


def test_hrnet_w18_small_v2_parity(tmp_path, rng):
    tm = randomize(TorchHRNet(), seed=99).eval()
    wts = tmp_path / "hr.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("hrnet", str(wts), num_classes=10, input_h=128,
                       input_w=128)
    x = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
