"""PyTorch Scaled-YOLOv4-CSP reference for parity testing.

Mirrors the darknet-converted module graph the reference's .wts comes from
(scaled-yolov4/yolov4_csp.cpp): all-Mish CSPDarknet backbone + CSP SPP/PAN
neck, `module_list.N.Conv2d` / `module_list.N.BatchNorm2d` naming."""

import torch
import torch.nn as nn
import torch.nn.functional as F

_STAGES = [
    (5, 128, 2, 6, 8, 15, 17),
    (18, 256, 8, 19, 21, 46, 48),
    (49, 512, 8, 50, 52, 77, 79),
    (80, 1024, 4, 81, 83, 96, 98),
]

_NECK = [
    (99, 512, 1024, 1), (101, 512, 1024, 1), (102, 512, 512, 3),
    (103, 512, 512, 1), (110, 512, 2048, 1), (111, 512, 512, 3),
    (113, 512, 1024, 1), (114, 256, 512, 1), (117, 256, 512, 1),
    (119, 256, 512, 1), (120, 256, 256, 1), (122, 256, 256, 1),
    (123, 256, 256, 3), (124, 256, 256, 1), (125, 256, 256, 3),
    (127, 256, 512, 1), (128, 128, 256, 1), (131, 128, 256, 1),
    (133, 128, 256, 1), (134, 128, 128, 1), (136, 128, 128, 1),
    (137, 128, 128, 3), (138, 128, 128, 1), (139, 128, 128, 3),
    (141, 128, 256, 1), (142, 256, 128, 3), (146, 256, 128, 3),
    (148, 256, 512, 1), (149, 256, 256, 1), (151, 256, 256, 1),
    (152, 256, 256, 3), (153, 256, 256, 1), (154, 256, 256, 3),
    (156, 256, 512, 1), (157, 512, 256, 3), (161, 512, 256, 3),
    (163, 512, 1024, 1), (164, 512, 512, 1), (166, 512, 512, 1),
    (167, 512, 512, 3), (168, 512, 512, 1), (169, 512, 512, 3),
    (171, 512, 1024, 1), (172, 1024, 512, 3),
]


class _CB(nn.Module):
    """conv+bn pair named Conv2d / BatchNorm2d (darknet converter layout)."""

    def __init__(self, ci, co, k):
        super().__init__()
        self.Conv2d = nn.Conv2d(ci, co, k, 1, k // 2, bias=False)
        self.BatchNorm2d = nn.BatchNorm2d(co, eps=1e-5)

    def forward(self, x, stride=1):
        w = self.Conv2d
        y = F.conv2d(x, w.weight, None, stride, w.padding)
        return F.mish(self.BatchNorm2d(y))


class _Det(nn.Module):
    def __init__(self, ci, no):
        super().__init__()
        self.Conv2d = nn.Conv2d(ci, no, 1, bias=True)

    def forward(self, x):
        return self.Conv2d(x)


class ScaledYolov4Torch(nn.Module):
    def __init__(self, nc=80):
        super().__init__()
        no = 3 * (5 + nc)
        ml = {}
        ml["0"] = _CB(3, 32, 3)
        ml["1"] = _CB(32, 64, 3)
        ml["2"] = _CB(64, 32, 1)
        ml["3"] = _CB(32, 64, 3)
        cin = 64
        for (down, ch, n, a, b, post, trans) in _STAGES:
            half = ch // 2
            ml[str(down)] = _CB(cin, ch, 3)
            ml[str(a)] = _CB(ch, half, 1)
            ml[str(b)] = _CB(ch, half, 1)
            for i in range(n):
                ml[str(b + 1 + 3 * i)] = _CB(half, half, 1)
                ml[str(b + 2 + 3 * i)] = _CB(half, half, 3)
            ml[str(post)] = _CB(half, half, 1)
            ml[str(trans)] = _CB(2 * half, ch, 1)
            cin = ch
        for i, co, ci, k in _NECK:
            ml[str(i)] = _CB(ci, co, k)
        for i, ci in ((143, 256), (158, 512), (173, 1024)):
            ml[str(i)] = _Det(ci, no)
        self.module_list = nn.ModuleDict(ml)

    def _csp(self, m, spec, x):
        down, ch, n, a, b, post, trans = spec
        d = m[str(down)](x, stride=2)
        ya = m[str(a)](d)
        y = m[str(b)](d)
        for i in range(n):
            y = y + m[str(b + 2 + 3 * i)](m[str(b + 1 + 3 * i)](y))
        y = m[str(post)](y)
        return m[str(trans)](torch.cat([y, ya], 1))

    def forward(self, x):
        m = self.module_list
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        y = m["1"](m["0"](x), stride=2)
        y = y + m["3"](m["2"](y))
        outs = []
        for spec in _STAGES:
            y = self._csp(m, spec, y)
            outs.append(y)
        l48, l79, l98 = outs[1], outs[2], outs[3]
        l99 = m["99"](l98)
        y = m["103"](m["102"](m["101"](l98)))
        spp = torch.cat([F.max_pool2d(y, 13, 1, 6), F.max_pool2d(y, 9, 1, 4),
                         F.max_pool2d(y, 5, 1, 2), y], 1)
        y = m["111"](m["110"](spp))
        l113 = m["113"](torch.cat([y, l99], 1))
        u = up(m["114"](l113))
        l117 = m["117"](l79)
        l119 = m["119"](torch.cat([l117, u], 1))
        l120 = m["120"](l119)
        y = m["125"](m["124"](m["123"](m["122"](l119))))
        l127 = m["127"](torch.cat([y, l120], 1))
        u = up(m["128"](l127))
        l131 = m["131"](l48)
        l133 = m["133"](torch.cat([l131, u], 1))
        l134 = m["134"](l133)
        y = m["139"](m["138"](m["137"](m["136"](l133))))
        l141 = m["141"](torch.cat([y, l134], 1))
        d8 = m["143"](m["142"](l141))
        y = torch.cat([m["146"](l141, stride=2), l127], 1)
        l148 = m["148"](y)
        l149 = m["149"](l148)
        y = m["154"](m["153"](m["152"](m["151"](l148))))
        l156 = m["156"](torch.cat([y, l149], 1))
        d16 = m["158"](m["157"](l156))
        y = torch.cat([m["161"](l156, stride=2), l113], 1)
        l163 = m["163"](y)
        l164 = m["164"](l163)
        y = m["169"](m["168"](m["167"](m["166"](l163))))
        l171 = m["171"](torch.cat([y, l164], 1))
        d32 = m["173"](m["172"](l171))
        return [d8, d16, d32]
