"""PyTorch YOLOv5-Lite-s reference for parity testing: ShuffleNetV2 backbone
+ depthwise neck + v5 anchor heads (mirrors yolov5-lite/v5lite.cpp, with the
mixed BN eps the checkpoints have: 1e-3 on the v5-style Conv wrappers
model.0/7/11, 1e-5 on the torchvision-style shuffle/DW blocks)."""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _ch(x, divisor=8.0):
    return int(math.ceil(x / divisor) * divisor)


def _shuffle(x):
    b, c, h, w = x.shape
    return (x.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w))


class ShuffleBlock(nn.Module):
    def __init__(self, cin, cout, s):
        super().__init__()
        self.s = s
        half = cout // 2
        if s > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(cin, cin, 3, s, 1, groups=cin, bias=False),
                nn.BatchNorm2d(cin, eps=1e-5),
                nn.Conv2d(cin, half, 1, bias=False),
                nn.BatchNorm2d(half, eps=1e-5),
                nn.ReLU(),
            )
            b2in = cin
        else:
            b2in = half
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2in, half, 1, bias=False),
            nn.BatchNorm2d(half, eps=1e-5), nn.ReLU(),
            nn.Conv2d(half, half, 3, s, 1, groups=half, bias=False),
            nn.BatchNorm2d(half, eps=1e-5),
            nn.Conv2d(half, half, 1, bias=False),
            nn.BatchNorm2d(half, eps=1e-5), nn.ReLU(),
        )

    def forward(self, x):
        if self.s > 1:
            out = torch.cat([self.branch1(x), self.branch2(x)], 1)
        else:
            c = x.shape[1] // 2
            out = torch.cat([x[:, :c], self.branch2(x[:, c:])], 1)
        return _shuffle(out)


class ConvBNSiLU(nn.Module):
    def __init__(self, ci, co, eps=1e-3):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, 1, bias=False)
        self.bn = nn.BatchNorm2d(co, eps=eps)

    def forward(self, x):
        return F.silu(self.bn(self.conv(x)))


class DWBlock(nn.Module):
    def __init__(self, ci, co, s=1):
        super().__init__()
        self.s = s
        self.conv1 = nn.Conv2d(ci, ci, 3, s, 1, groups=ci, bias=False)
        self.bn1 = nn.BatchNorm2d(ci, eps=1e-5)
        self.conv2 = nn.Conv2d(ci, co, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(co, eps=1e-5)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        return F.relu(self.bn2(self.conv2(y)))


class Stem(nn.Module):
    """conv_bn_relu_maxpool (v5lite.cpp:144): names model.0.conv.0/.1"""

    def __init__(self):
        super().__init__()
        self.conv = nn.Sequential(nn.Conv2d(3, 32, 3, 2, 1, bias=False),
                                  nn.BatchNorm2d(32, eps=1e-3))

    def forward(self, x):
        return F.max_pool2d(F.relu(self.conv[1](self.conv[0](x))), 3, 2, 1)


class Yolov5LiteTorch(nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        c116, c232, c464, c96 = _ch(116), _ch(232), _ch(464), _ch(96)
        no = 3 * (5 + nc)
        det = nn.Module()
        det.m = nn.ModuleList(nn.Conv2d(c96, no, 1) for _ in range(3))
        self.model = nn.ModuleList([
            Stem(),                                         # 0
            ShuffleBlock(32, c116, 2),                      # 1
            nn.Sequential(*(ShuffleBlock(c116, c116, 1)
                            for _ in range(3))),            # 2
            ShuffleBlock(c116, c232, 2),                    # 3
            nn.Sequential(*(ShuffleBlock(c232, c232, 1)
                            for _ in range(7))),            # 4
            ShuffleBlock(c232, c464, 2),                    # 5
            ShuffleBlock(c464, c464, 1),                    # 6
            ConvBNSiLU(c464, c96),                          # 7
            nn.Upsample(scale_factor=2), nn.Identity(),     # 8 9
            DWBlock(c96 + c232, c96),                       # 10
            ConvBNSiLU(c96, c96),                           # 11
            nn.Upsample(scale_factor=2), nn.Identity(),     # 12 13
            DWBlock(c96 + c116, c96),                       # 14
            DWBlock(c96, c96, s=2),                         # 15
            nn.Identity(),                                  # 16
            DWBlock(c96, c96),                              # 17
            DWBlock(c96, c96, s=2),                         # 18
            nn.Identity(),                                  # 19
            DWBlock(c96, c96),                              # 20
            det,                                            # 21
        ])

    def forward(self, x):
        m = self.model
        y = m[0](x)
        y = m[2](m[1](y))
        c2 = y
        y = m[4](m[3](y))
        c4 = y
        y = m[6](m[5](y))
        p7 = m[7](y)
        y = m[10](torch.cat([m[8](p7), c4], 1))
        p11 = m[11](y)
        p14 = m[14](torch.cat([m[12](p11), c2], 1))
        p17 = m[17](m[15](p14) + p11)
        p20 = m[20](m[18](p17) + p7)
        return [m[21].m[i](f) for i, f in enumerate([p14, p17, p20])]
