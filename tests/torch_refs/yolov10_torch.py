"""PyTorch YOLOv10 reference for parity testing: SCDown/PSA/C2fCIB blocks and
the NMS-free one2one head. Mirrors yolov10/src/model.cpp:33-1280 and
block.cpp (SCDown :279, PSA :360, RepVGGDW :388, CIB :405, C2fCIB :433)
with matching state_dict names."""

import torch
import torch.nn as nn

from torch_refs.yolo11_torch import (Attention, C2f, Conv, DWConv, SPPF,
                                     get_depth, get_width)

_CIB = {
    "n": {22: True},
    "s": {8: True, 22: True},
    "m": {8: False, 19: False, 22: False},
    "b": {8: False, 13: False, 19: False, 22: False},
    "l": {8: False, 13: False, 19: False, 22: False},
    "x": {6: False, 8: False, 13: False, 19: False, 22: False},
}


class SCDown(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = Conv(c1, c2, 1)
        self.cv2 = Conv(c2, c2, 3, 2, g=c2, act=False)

    def forward(self, x):
        return self.cv2(self.cv1(x))


class RepVGGDW(nn.Module):
    def __init__(self, ed):
        super().__init__()
        self.conv = Conv(ed, ed, 7, 1, g=ed, act=False, p=3)
        self.conv1 = Conv(ed, ed, 3, 1, g=ed, act=False)

    def forward(self, x):
        return torch.nn.functional.silu(self.conv(x) + self.conv1(x))


class CIB(nn.Module):
    def __init__(self, c1, c2, lk=False, e=1.0):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = nn.Sequential(
            Conv(c1, c1, 3, g=c1),
            Conv(c1, 2 * c_, 1),
            RepVGGDW(2 * c_) if lk else Conv(2 * c_, 2 * c_, 3, g=2 * c_),
            Conv(2 * c_, c2, 1),
            Conv(c2, c2, 3, g=c2),
        )

    def forward(self, x):
        return x + self.cv1(x)


class C2fCIB(nn.Module):
    def __init__(self, c1, c2, n=1, lk=False, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(CIB(self.c, self.c, lk) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class PSA(nn.Module):
    def __init__(self, c1):
        super().__init__()
        self.c = c1 // 2
        self.cv1 = Conv(c1, c1, 1)
        self.cv2 = Conv(c1, c1, 1)
        self.attn = Attention(self.c, attn_ratio=0.5,
                              num_heads=self.c // 64)
        self.ffn = nn.Sequential(Conv(self.c, self.c * 2, 1),
                                 Conv(self.c * 2, self.c, 1, act=False))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = b + self.attn(b)
        b = b + self.ffn(b)
        return self.cv2(torch.cat((a, b), 1))


class V10Head(nn.Module):
    """one2one head with DFL box branch + dw-separable cls branch."""

    def __init__(self, nc, ch, reg_max=16):
        super().__init__()
        c2 = max(16, max(ch[0] // 4, 64))
        c3 = max(ch[0], min(nc, 100))
        self.one2one_cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.one2one_cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats):
        return [(self.one2one_cv2[i](f), self.one2one_cv3[i](f))
                for i, f in enumerate(feats)]


class Yolov10Torch(nn.Module):
    def __init__(self, nc=80, scale="n"):
        super().__init__()
        gd, gw, maxc = {"n": (0.33, 0.25, 1024), "s": (0.33, 0.50, 1024),
                        "m": (0.67, 0.75, 768), "b": (0.67, 1.00, 512),
                        "l": (1.00, 1.00, 512), "x": (1.00, 1.25, 512)}[scale]
        w = lambda x: get_width(x, gw, maxc)
        d = lambda x: get_depth(x, gd)
        cib = _CIB[scale]

        def blk(idx, c1, c2, n):
            if idx in cib:
                return C2fCIB(c1, c2, n, lk=cib[idx])
            return C2f(c1, c2, n, shortcut=idx < 10)

        self.model = nn.ModuleList([
            Conv(3, w(64), 3, 2), Conv(w(64), w(128), 3, 2),
            blk(2, w(128), w(128), d(3)),
            Conv(w(128), w(256), 3, 2),
            blk(4, w(256), w(256), d(6)),
            SCDown(w(256), w(512)),
            blk(6, w(512), w(512), d(6)),
            SCDown(w(512), w(1024)),
            blk(8, w(1024), w(1024), d(3)),
            SPPF(w(1024), w(1024)),                             # 9
            PSA(w(1024)),                                       # 10
            nn.Upsample(scale_factor=2), nn.Identity(),         # 11 12
            blk(13, w(1024) + w(512), w(512), d(3)),
            nn.Upsample(scale_factor=2), nn.Identity(),         # 14 15
            blk(16, w(512) + w(256), w(256), d(3)),
            Conv(w(256), w(256), 3, 2), nn.Identity(),          # 17 18
            blk(19, w(512) + w(256), w(512), d(3)),
            SCDown(w(512), w(512)), nn.Identity(),              # 20 21
            blk(22, w(1024) + w(512), w(1024), d(3)),
            V10Head(nc, [w(256), w(512), w(1024)]),             # 23
        ])

    def forward(self, x):
        m = self.model
        y = m[2](m[1](m[0](x)))
        c4 = m[4](m[3](y))
        c6 = m[6](m[5](c4))
        y = m[8](m[7](c6))
        c10 = m[10](m[9](y))
        c13 = m[13](torch.cat([m[11](c10), c6], 1))
        p3 = m[16](torch.cat([m[14](c13), c4], 1))
        p4 = m[19](torch.cat([m[17](p3), c13], 1))
        p5 = m[22](torch.cat([m[20](p4), c10], 1))
        return m[23]([p3, p4, p5])
