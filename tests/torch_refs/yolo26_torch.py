"""PyTorch YOLO26 reference for parity testing: yolo11-style backbone with
the attention-C3K2 final stage and the NMS-free one2one head (no DFL,
reg_max=1). Mirrors yolo26/src/model.cpp:33-403 (det), :414 (obb), :874
(cls), block.cpp:273-330 (C3K2 attn variant). Matching state_dict names."""

import torch
import torch.nn as nn

from torch_refs.yolo11_torch import (Bottleneck, C2PSA, C3k2, Conv, DWConv,
                                     PSABlock, SPPF, get_depth, get_width)


class C3k2Attn(nn.Module):
    """C3K2 with attn m blocks: each m.i = Bottleneck → PSABlock."""

    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, 2 * c_, 1)
        self.cv2 = Conv((2 + n) * c_, c2, 1)
        self.m = nn.ModuleList(
            nn.Sequential(Bottleneck(c_, c_, True, k=(3, 3), e=0.5),
                          PSABlock(c_, 0.5, max(c_ // 64, 1)))
            for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class One2OneHead(nn.Module):
    """one2one end-to-end head: cv2 direct-ltrb (4ch) + cv3 dw-separable cls
    (+ optional cv4 angle for obb)."""

    def __init__(self, nc, ch, obb=False):
        super().__init__()
        c2 = max(16, ch[0], 64)
        c3 = max(ch[0], min(nc, 100))
        self.one2one_cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2 // 4, 3), Conv(c2 // 4, c2 // 4, 3),
                          nn.Conv2d(c2 // 4, 4, 1)) for x in ch)
        self.one2one_cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1)) for x in ch)
        if obb:
            self.one2one_cv4 = nn.ModuleList(
                nn.Sequential(Conv(x, c2 // 4, 3), Conv(c2 // 4, c2 // 4, 3),
                              nn.Conv2d(c2 // 4, 1, 1)) for x in ch)

    def forward(self, feats):
        out = [(self.one2one_cv2[i](f), self.one2one_cv3[i](f))
               for i, f in enumerate(feats)]
        return out


class Yolo26Torch(nn.Module):
    def __init__(self, nc=80, scale="n", task="det"):
        super().__init__()
        gd, gw, maxc = {"n": (0.5, 0.25, 1024), "s": (0.5, 0.5, 1024),
                        "m": (0.5, 1.0, 512), "l": (1.0, 1.0, 512),
                        "x": (1.0, 1.5, 512)}[scale]
        w = lambda x: get_width(x, gw, maxc)
        d = lambda x: get_depth(x, gd)
        c3k = scale in ("m", "l", "x")
        self.task = task
        backbone = [
            Conv(3, w(64), 3, 2), Conv(w(64), w(128), 3, 2),
            C3k2(w(128), w(256), d(2), c3k, e=0.25),
            Conv(w(256), w(256), 3, 2),
            C3k2(w(256), w(512), d(2), c3k, e=0.25),
            Conv(w(512), w(512), 3, 2),
            C3k2(w(512), w(512), d(2), True, e=0.5),
            Conv(w(512), w(1024), 3, 2),
            C3k2(w(1024), w(1024), d(2), True, e=0.5),
        ]
        if task == "cls":
            head = nn.Module()
            head.conv = Conv(w(1024), 1280, 1)
            head.linear = nn.Linear(1280, nc)
            backbone += [C2PSA(w(1024), w(1024), d(2)), head]   # 9, 10
            self.model = nn.ModuleList(backbone)
            return
        layers = backbone + [
            SPPF(w(1024), w(1024), 5),                          # 9
            C2PSA(w(1024), w(1024), d(2)),                      # 10
            nn.Upsample(scale_factor=2), nn.Identity(),         # 11 12
            C3k2(w(1024) + w(512), w(512), d(2), True, e=0.5),  # 13
            nn.Upsample(scale_factor=2), nn.Identity(),         # 14 15
            C3k2(w(512) + w(512), w(256), d(2), True, e=0.5),   # 16
            Conv(w(256), w(256), 3, 2), nn.Identity(),          # 17 18
            C3k2(w(512) + w(256), w(512), d(2), True, e=0.5),   # 19
            Conv(w(512), w(512), 3, 2), nn.Identity(),          # 20 21
            C3k2Attn(w(1024) + w(512), w(1024), 1),             # 22
            One2OneHead(nc, [w(256), w(512), w(1024)],
                        obb=(task == "obb")),                   # 23
        ]
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        if self.task == "cls":
            for i in range(9):
                x = m[i](x)
            x = m[9](x)
            h = m[10]
            return h.linear(h.conv(x).mean((2, 3)))
        y = m[2](m[1](m[0](x)))
        c4 = m[4](m[3](y))
        c6 = m[6](m[5](c4))
        y = m[8](m[7](c6))
        c10 = m[10](m[9](y))
        c13 = m[13](torch.cat([m[11](c10), c6], 1))
        p3 = m[16](torch.cat([m[14](c13), c4], 1))
        p4 = m[19](torch.cat([m[17](p3), c13], 1))
        p5 = m[22](torch.cat([m[20](p4), c10], 1))
        feats = [p3, p4, p5]
        out = {"head": m[23](feats)}
        if self.task == "obb":
            out["cv4"] = [m[23].one2one_cv4[i](f)
                          for i, f in enumerate(feats)]
        return out
