"""PyTorch HRNetV2 semantic-segmentation reference for parity testing.

Mirrors the official HRNet-Semantic-Segmentation module graph the
reference's .wts comes from (hrnet/hrnet-semantic-segmentation/hrnet.cpp:
23-380) with matching state_dict names: stem conv1/bn1+conv2/bn2, layer1
bottlenecks, transitionN, stageN.M (branches + fuse_layers, bilinear
align_corners=True fusion), last_layer head."""

import torch
import torch.nn as nn
import torch.nn.functional as F

MODS = (1, 4, 3)


def _up(t, size):
    return F.interpolate(t, size=size, mode="bilinear", align_corners=True)


class BasicBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(x + y)


class Bottleneck(nn.Module):
    def __init__(self, cin, planes, down):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        if down:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, bias=False),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        sc = self.downsample(x) if hasattr(self, "downsample") else x
        return F.relu(y + sc)


class HRModule(nn.Module):
    def __init__(self, chans, n_blocks):
        super().__init__()
        nb = len(chans)
        self.branches = nn.ModuleList(
            nn.Sequential(*(BasicBlock(chans[b]) for _ in range(n_blocks)))
            for b in range(nb))
        fl = []
        for i in range(nb):
            row = []
            for j in range(nb):
                if i == j:
                    row.append(nn.Identity())
                elif j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(chans[j], chans[i], 1, bias=False),
                        nn.BatchNorm2d(chans[i])))
                else:
                    steps = []
                    for k in range(i - j):
                        co = chans[i] if k == i - j - 1 else chans[j]
                        steps.append(nn.Sequential(
                            nn.Conv2d(chans[j], co, 3, 2, 1, bias=False),
                            nn.BatchNorm2d(co)))
                    row.append(nn.Sequential(*steps))
            fl.append(nn.ModuleList(row))
        self.fuse_layers = nn.ModuleList(fl)
        self.nb = nb

    def forward(self, xs):
        ys = [self.branches[b](xs[b]) for b in range(self.nb)]
        outs = []
        for i in range(self.nb):
            acc = ys[i]
            for j in range(self.nb):
                if i == j:
                    continue
                if j > i:
                    t = self.fuse_layers[i][j](ys[j])
                    t = _up(t, ys[i].shape[-2:])
                else:
                    t = ys[j]
                    steps = list(self.fuse_layers[i][j])
                    for k, st in enumerate(steps):
                        t = st(t)
                        if k != len(steps) - 1:
                            t = F.relu(t)
                acc = acc + t
            outs.append(F.relu(acc))
        return outs


class HRNetSegTorch(nn.Module):
    def __init__(self, width=18, num_classes=19):
        super().__init__()
        w = width
        chans = ((w, 2 * w), (w, 2 * w, 4 * w), (w, 2 * w, 4 * w, 8 * w))
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(
            Bottleneck(64, 64, True), *(Bottleneck(256, 64, False)
                                        for _ in range(3)))
        self.transition1 = nn.ModuleList([
            nn.Sequential(nn.Conv2d(256, chans[0][0], 3, 1, 1, bias=False),
                          nn.BatchNorm2d(chans[0][0]), nn.ReLU()),
            nn.Sequential(nn.Sequential(
                nn.Conv2d(256, chans[0][1], 3, 2, 1, bias=False),
                nn.BatchNorm2d(chans[0][1]), nn.ReLU())),
        ])
        for si in range(3):
            setattr(self, f"stage{si + 2}", nn.Sequential(
                *(HRModule(chans[si], 4) for _ in range(MODS[si]))))
            if si < 2:
                nb = len(chans[si])
                tr = nn.ModuleList([nn.Identity()] * nb + [nn.Sequential(
                    nn.Sequential(
                        nn.Conv2d(chans[si][-1], chans[si + 1][nb], 3, 2, 1,
                                  bias=False),
                        nn.BatchNorm2d(chans[si + 1][nb]), nn.ReLU()))])
                setattr(self, f"transition{si + 2}", tr)
        self.last_layer = nn.Sequential(
            nn.Conv2d(15 * w, 15 * w, 1, bias=False),
            nn.BatchNorm2d(15 * w), nn.ReLU(),
            nn.Conv2d(15 * w, num_classes, 1))

    def forward(self, x):
        h, wid = x.shape[-2:]
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.layer1(y)
        xs = [self.transition1[0](y), self.transition1[1](y)]
        for si in range(3):
            for mod in getattr(self, f"stage{si + 2}"):
                xs = mod(xs)
            if si < 2:
                tr = getattr(self, f"transition{si + 2}")
                xs = xs + [tr[-1](xs[-1])]
        size = xs[0].shape[-2:]
        cat = torch.cat([xs[0]] + [_up(xs[i], size) for i in range(1, 4)], 1)
        y = self.last_layer(cat)
        return _up(y, (h, wid))
