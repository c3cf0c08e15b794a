"""PyTorch YOLOv8 reference covering the variant matrix (p2, 5u, pose, obb,
seg) for parity testing, mirroring the ultralytics module graphs the
reference's gen_wts.py consumes (yolov8/src/model.cpp builders:
buildEngineYolov8DetP2 model.cpp:653, buildEngineYolov8_5uDet model.cpp:1904).

Matching state_dict names (model.N.*) so the .wts feeds build_engine directly.
"""

import math

import torch
import torch.nn as nn

from torch_refs.yolo11_torch import C3, C2f, Conv, Proto, SegExtra, SPPF

SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


class DetectV8(nn.Module):
    """Anchor-free Detect head (cv2 box-dist + cv3 cls per level)."""

    def __init__(self, nc=80, ch=(), reg_max=16):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        c2 = max(16, ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(x, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for x in ch)
        self.dfl = nn.Module()
        self.dfl.conv = nn.Conv2d(reg_max, 1, 1, bias=False)
        self.dfl.conv.weight.data = torch.arange(
            reg_max, dtype=torch.float32).view(1, reg_max, 1, 1)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)]


class Yolov8VariantTorch(nn.Module):
    """v8 det graph with optional p2 / 5u variants and seg/pose/obb extras."""

    def __init__(self, nc=80, scale="n", task="det", variant="", num_kpts=17):
        super().__init__()
        gd, gw, maxc = SCALES[scale]
        if variant == "5u":
            maxc = 1 << 30          # get_width_5u: no channel cap
        w = lambda x: int(math.ceil(min(x, maxc) * gw / 8)) * 8
        d = lambda x: max(round(x * gd), 1)
        self.task, self.variant = task, variant
        if variant == "p2":
            layers = [
                Conv(3, w(64), 3, 2), Conv(w(64), w(128), 3, 2),
                C2f(w(128), w(128), d(3), True),
                Conv(w(128), w(256), 3, 2), C2f(w(256), w(256), d(6), True),
                Conv(w(256), w(512), 3, 2), C2f(w(512), w(512), d(6), True),
                Conv(w(512), w(1024), 3, 2), C2f(w(1024), w(1024), d(3), True),
                SPPF(w(1024), w(1024)),                                 # 9
                nn.Upsample(scale_factor=2), nn.Identity(),             # 10 11
                C2f(w(1024) + w(512), w(512), d(3), False),             # 12
                nn.Upsample(scale_factor=2), nn.Identity(),             # 13 14
                C2f(w(512) + w(256), w(256), d(3), False),              # 15
                nn.Upsample(scale_factor=2), nn.Identity(),             # 16 17
                C2f(w(256) + w(128), w(128), d(3), False),              # 18 p2
                Conv(w(128), w(128), 3, 2), nn.Identity(),              # 19 20
                C2f(w(256) + w(128), w(256), d(3), False),              # 21 p3
                Conv(w(256), w(256), 3, 2), nn.Identity(),              # 22 23
                C2f(w(512) + w(256), w(512), d(3), False),              # 24 p4
                Conv(w(512), w(512), 3, 2), nn.Identity(),              # 25 26
                C2f(w(1024) + w(512), w(1024), d(3), False),            # 27 p5
            ]
            ch = (w(128), w(256), w(512), w(1024))
        elif variant == "5u":
            layers = [
                Conv(3, w(64), 6, 2, p=2), Conv(w(64), w(128), 3, 2),
                C3(w(128), w(128), d(3), True),
                Conv(w(128), w(256), 3, 2), C3(w(256), w(256), d(6), True),
                Conv(w(256), w(512), 3, 2), C3(w(512), w(512), d(6), True),
                Conv(w(512), w(1024), 3, 2), C3(w(1024), w(1024), d(3), True),
                SPPF(w(1024), w(1024)),                                 # 9
                Conv(w(1024), w(512), 1),                               # 10
                nn.Upsample(scale_factor=2), nn.Identity(),             # 11 12
                C3(w(512) + w(512), w(512), d(3), False),               # 13
                Conv(w(512), w(256), 1),                                # 14
                nn.Upsample(scale_factor=2), nn.Identity(),             # 15 16
                C3(w(256) + w(256), w(256), d(3), False),               # 17 p3
                Conv(w(256), w(256), 3, 2), nn.Identity(),              # 18 19
                C3(w(256) + w(256), w(512), d(3), False),               # 20 p4
                Conv(w(512), w(512), 3, 2), nn.Identity(),              # 21 22
                C3(w(512) + w(512), w(1024), d(3), False),              # 23 p5
            ]
            ch = (w(256), w(512), w(1024))
        else:
            layers = [
                Conv(3, w(64), 3, 2), Conv(w(64), w(128), 3, 2),
                C2f(w(128), w(128), d(3), True),
                Conv(w(128), w(256), 3, 2), C2f(w(256), w(256), d(6), True),
                Conv(w(256), w(512), 3, 2), C2f(w(512), w(512), d(6), True),
                Conv(w(512), w(1024), 3, 2), C2f(w(1024), w(1024), d(3), True),
                SPPF(w(1024), w(1024)),                                 # 9
                nn.Upsample(scale_factor=2), nn.Identity(),             # 10 11
                C2f(w(1024) + w(512), w(512), d(3), False),             # 12
                nn.Upsample(scale_factor=2), nn.Identity(),             # 13 14
                C2f(w(512) + w(256), w(256), d(3), False),              # 15 p3
                Conv(w(256), w(256), 3, 2), nn.Identity(),              # 16 17
                C2f(w(512) + w(256), w(512), d(3), False),              # 18 p4
                Conv(w(512), w(512), 3, 2), nn.Identity(),              # 19 20
                C2f(w(1024) + w(512), w(1024), d(3), False),            # 21 p5
            ]
            ch = (w(256), w(512), w(1024))
        det = DetectV8(nc=1 if task == "pose" else nc, ch=ch)
        if task == "seg":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, 32), 32)
            det.proto = Proto(ch[0], w(256), 32)
        elif task == "pose":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, num_kpts * 3), num_kpts * 3)
        elif task == "obb":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, 1), 1)
        layers.append(det)
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        if self.variant == "p2":
            y = m[1](m[0](x))
            c2 = m[2](y)
            c4 = m[4](m[3](c2))
            c6 = m[6](m[5](c4))
            y = m[8](m[7](c6))
            p5i = m[9](y)
            m12 = m[12](torch.cat([m[10](p5i), c6], 1))
            m15 = m[15](torch.cat([m[13](m12), c4], 1))
            p2 = m[18](torch.cat([m[16](m15), c2], 1))
            p3 = m[21](torch.cat([m[19](p2), m15], 1))
            p4 = m[24](torch.cat([m[22](p3), m12], 1))
            p5 = m[27](torch.cat([m[25](p4), p5i], 1))
            feats, det = [p2, p3, p4, p5], m[28]
        elif self.variant == "5u":
            y = m[2](m[1](m[0](x)))
            c4 = m[4](m[3](y))
            c6 = m[6](m[5](c4))
            sp = m[9](m[8](m[7](c6)))
            m10 = m[10](sp)
            m13 = m[13](torch.cat([m[11](m10), c6], 1))
            m14 = m[14](m13)
            p3 = m[17](torch.cat([m[15](m14), c4], 1))
            p4 = m[20](torch.cat([m[18](p3), m14], 1))
            p5 = m[23](torch.cat([m[21](p4), m10], 1))
            feats, det = [p3, p4, p5], m[24]
        else:
            y = m[2](m[1](m[0](x)))
            c4 = m[4](m[3](y))
            c6 = m[6](m[5](c4))
            y = m[8](m[7](c6))
            p5i = m[9](y)
            p4m = m[12](torch.cat([m[10](p5i), c6], 1))
            p3 = m[15](torch.cat([m[13](p4m), c4], 1))
            p4 = m[18](torch.cat([m[16](p3), p4m], 1))
            p5 = m[21](torch.cat([m[19](p4), p5i], 1))
            feats, det = [p3, p4, p5], m[22]
        out = {"head": det(feats)}
        if self.task in ("seg", "pose", "obb"):
            out["cv4"] = det.cv4(feats)
        if self.task == "seg":
            out["proto"] = det.proto(feats[0])
        return out
