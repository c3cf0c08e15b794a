"""PyTorch YOLOv9 reference graphs for parity testing.

Mirrors the source module graphs the reference's .wts files come from
(yolov9/src/block.cpp: RepConvN :156, RepNCSP :185, RepNCSPELAN4 :230,
ELAN1 :208, ADown :264, AConv :256, SPPELAN :342, CBLinear :292,
CBFuse :314, DDetect :424) with matching state_dict names:
  - converted t/s/m DDetect graphs (model.cpp:25-555, isConvert=true)
  - the yolov9-c PGI dual-branch graph (model.cpp:557-729)
"""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_refs.yolo11_torch import Conv


class RepConvN(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.conv1 = Conv(c1, c2, 3, act=False)
        self.conv2 = Conv(c1, c2, 1, act=False)

    def forward(self, x):
        return F.silu(self.conv1(x) + self.conv2(x))


class RepNBottleneck(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = RepConvN(c1, c2)
        self.cv2 = Conv(c2, c2, 3)

    def forward(self, x):
        return x + self.cv2(self.cv1(x))


class RepNCSP(nn.Module):
    def __init__(self, c1, c2, n=1):
        super().__init__()
        c_ = c2 // 2
        self.cv1 = Conv(c1, c_, 1)
        self.cv2 = Conv(c1, c_, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(RepNBottleneck(c_, c_) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class RepNCSPELAN4(nn.Module):
    def __init__(self, c1, c2, c3, c4, n=1):
        super().__init__()
        self.c = c3 // 2
        self.cv1 = Conv(c1, c3, 1)
        self.cv2 = nn.Sequential(RepNCSP(c3 // 2, c4, n), Conv(c4, c4, 3))
        self.cv3 = nn.Sequential(RepNCSP(c4, c4, n), Conv(c4, c4, 3))
        self.cv4 = Conv(c3 + 2 * c4, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in (self.cv2, self.cv3))
        return self.cv4(torch.cat(y, 1))


class ELAN1(nn.Module):
    def __init__(self, c1, c2, c3, c4):
        super().__init__()
        self.c = c3 // 2
        self.cv1 = Conv(c1, c3, 1)
        self.cv2 = Conv(c3 // 2, c4, 3)
        self.cv3 = Conv(c4, c4, 3)
        self.cv4 = Conv(c3 + 2 * c4, c2, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in (self.cv2, self.cv3))
        return self.cv4(torch.cat(y, 1))


class ADown(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = Conv(c1 // 2, self.c, 3, 2)
        self.cv2 = Conv(c1 // 2, self.c, 1)

    def forward(self, x):
        x = F.avg_pool2d(x, 2, 1)
        x1, x2 = x.chunk(2, 1)
        return torch.cat((self.cv1(x1),
                          self.cv2(F.max_pool2d(x2, 3, 2, 1))), 1)


class AConv(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.cv1 = Conv(c1, c2, 3, 2)

    def forward(self, x):
        return self.cv1(F.avg_pool2d(x, 2, 1))


class SPPELAN(nn.Module):
    def __init__(self, c1, c2, c3):
        super().__init__()
        self.cv1 = Conv(c1, c3, 1)
        self.cv5 = Conv(4 * c3, c2, 1)

    def forward(self, x):
        y = [self.cv1(x)]
        for _ in range(3):
            y.append(F.max_pool2d(y[-1], 5, 1, 2))
        return self.cv5(torch.cat(y, 1))


class CBLinear(nn.Module):
    def __init__(self, c1, c2s):
        super().__init__()
        self.c2s = c2s
        self.conv = nn.Conv2d(c1, sum(c2s), 1, bias=True)

    def forward(self, x):
        return self.conv(x).split(self.c2s, dim=1)


class DDetectHead(nn.Module):
    """DDetect cv2 (grouped box branch) + cv3 per level (block.cpp:424-478)."""

    def __init__(self, nc, ch, c3_cap, reg_max=16):
        super().__init__()
        c2 = max(ch[0] // 4, reg_max * 4)
        c3 = max(ch[0], min(c3_cap, 128))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3, g=4),
                          nn.Conv2d(c2, 4 * reg_max, 1, groups=4)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(Conv(x, c3, 3), Conv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for x in ch)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)]


_CONVERTED = {
    "t": {"stem": (16, 32), "elan1": (32, 32, 16),
          "stages": [(64, (64, 64, 32, 3)), (96, (96, 96, 48, 3)),
                     (128, (128, 128, 64, 3))],
          "spp": (128, 64),
          "m12": (96, 96, 48, 3), "m15": (64, 64, 32, 3), "d16": 48,
          "m18": (96, 96, 48, 3), "d19": 64, "m21": (128, 128, 64, 3),
          "head": (64, 96, 128)},
    "s": {"stem": (32, 64), "elan1": (64, 64, 32),
          "stages": [(128, (128, 128, 64, 3)), (192, (192, 192, 96, 3)),
                     (256, (256, 256, 128, 3))],
          "spp": (256, 128),
          "m12": (192, 192, 96, 3), "m15": (128, 128, 64, 3), "d16": 96,
          "m18": (192, 192, 96, 3), "d19": 128, "m21": (256, 256, 128, 1),
          "head": (128, 192, 256)},
    "m": {"stem": (32, 64), "elan2": (128, 128, 64, 1),
          "stages": [(240, (240, 240, 120, 1)), (360, (360, 360, 180, 1)),
                     (480, (480, 480, 240, 1))],
          "spp": (480, 240),
          "m12": (360, 360, 180, 1), "m15": (240, 240, 120, 1), "d16": 184,
          "m18": (360, 360, 180, 1), "d19": 240, "m21": (480, 480, 240, 1),
          "head": (240, 360, 480)},
}


class Yolov9ConvertedTorch(nn.Module):
    """Converted (DDetect) t/s/m graph."""

    def __init__(self, scale="t", nc=80):
        super().__init__()
        s = _CONVERTED[scale]
        c0, c1 = s["stem"]
        layers = [Conv(3, c0, 3, 2), Conv(c0, c1, 3, 2)]
        if "elan1" in s:
            c2_, c3_, c4_ = s["elan1"]
            layers.append(ELAN1(c1, c2_, c3_, c4_))
            cin = c2_
        else:
            c2_, c3_, c4_, n = s["elan2"]
            layers.append(RepNCSPELAN4(c1, c2_, c3_, c4_, n))
            cin = c2_
        for down_c, (e2, e3, e4, n) in s["stages"]:
            layers.append(AConv(cin, down_c))
            layers.append(RepNCSPELAN4(down_c, e2, e3, e4, n))
            cin = e2
        spp_c2, spp_c3 = s["spp"]
        layers.append(SPPELAN(cin, spp_c2, spp_c3))                  # 9
        p4_src = s["stages"][1][1][0]
        p3_src = s["stages"][0][1][0]
        layers += [
            nn.Upsample(scale_factor=2), nn.Identity(),              # 10 11
            RepNCSPELAN4(spp_c2 + p4_src, *s["m12"]),                # 12
            nn.Upsample(scale_factor=2), nn.Identity(),              # 13 14
            RepNCSPELAN4(s["m12"][0] + p3_src, *s["m15"]),           # 15
            AConv(s["m15"][0], s["d16"]), nn.Identity(),             # 16 17
            RepNCSPELAN4(s["d16"] + s["m12"][0], *s["m18"]),         # 18
            AConv(s["m18"][0], s["d19"]), nn.Identity(),             # 19 20
            RepNCSPELAN4(s["d19"] + spp_c2, *s["m21"]),              # 21
            DDetectHead(nc, list(s["head"]), c3_cap=nc),             # 22
        ]
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        y = m[2](m[1](m[0](x)))
        y = m[3](y)
        c4 = m[4](y)
        c6 = m[6](m[5](c4))
        spp = m[9](m[8](m[7](c6)))
        m12 = m[12](torch.cat([m[10](spp), c6], 1))
        p3 = m[15](torch.cat([m[13](m12), c4], 1))
        p4 = m[18](torch.cat([m[16](p3), m12], 1))
        p5 = m[21](torch.cat([m[19](p4), spp], 1))
        return m[22]([p3, p4, p5])


class Yolov9ETorch(nn.Module):
    """yolov9-e live subgraph (model.cpp:742-960): DualDDetect model.49 reads
    [repncspelan_35, repncspelan_32, sppelan_29] — all fed by backbone-A
    only, so the PGI B-branch (models 10-28) and PAN-B (36-48) are dead
    code TRT prunes from the engine. Only the live layers exist here."""

    def __init__(self, nc=80):
        super().__init__()
        self.model = nn.ModuleDict({
            "1": Conv(3, 64, 3, 2), "2": Conv(64, 128, 3, 2),
            "3": RepNCSPELAN4(128, 256, 128, 64, 2),
            "4": ADown(256, 256),
            "5": RepNCSPELAN4(256, 512, 256, 128, 2),
            "6": ADown(512, 512),
            "7": RepNCSPELAN4(512, 1024, 512, 256, 2),
            "8": ADown(1024, 1024),
            "9": RepNCSPELAN4(1024, 1024, 512, 256, 2),
            "29": SPPELAN(1024, 512, 256),
            "32": RepNCSPELAN4(1536, 512, 512, 256, 2),
            "35": RepNCSPELAN4(1024, 256, 256, 128, 2),
            "49": DDetectHead(nc, [256, 512, 512], c3_cap=nc * 2),
        })

    def forward(self, x):
        m = self.model
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        e5 = m["5"](m["4"](m["3"](m["2"](m["1"](x)))))
        e7 = m["7"](m["6"](e5))
        spp = m["29"](m["9"](m["8"](e7)))
        p4 = m["32"](torch.cat([up(spp), e7], 1))
        p3 = m["35"](torch.cat([up(p4), e5], 1))
        return m["49"]([p3, p4, spp])


class Yolov9CTorch(nn.Module):
    """yolov9-c PGI dual-branch graph (model.cpp:557-729); detection runs on
    the reversible-branch outputs model.31/34/37 (PAN 11-22 is dead code)."""

    def __init__(self, nc=80):
        super().__init__()
        self.model = nn.ModuleDict({
            "1": Conv(3, 64, 3, 2), "2": Conv(64, 128, 3, 2),
            "3": RepNCSPELAN4(128, 256, 128, 64),
            "4": ADown(256, 256),
            "5": RepNCSPELAN4(256, 512, 256, 128),
            "6": ADown(512, 512),
            "7": RepNCSPELAN4(512, 512, 512, 256),
            "8": ADown(512, 512),
            "9": RepNCSPELAN4(512, 512, 512, 256),
            "10": SPPELAN(512, 512, 256),
            "23": CBLinear(512, (256,)),
            "24": CBLinear(512, (256, 512)),
            "25": CBLinear(512, (256, 512, 512)),
            "26": Conv(3, 64, 3, 2), "27": Conv(64, 128, 3, 2),
            "28": RepNCSPELAN4(128, 256, 128, 64),
            "29": ADown(256, 256),
            "31": RepNCSPELAN4(256, 512, 256, 128),
            "32": ADown(512, 512),
            "34": RepNCSPELAN4(512, 512, 512, 256),
            "35": ADown(512, 512),
            "37": RepNCSPELAN4(512, 512, 512, 256),
            "38": DDetectHead(nc, [512, 512, 512], c3_cap=nc * 2),
        })

    def state_dict(self, *a, **kw):
        # ModuleDict already yields model.<idx>.* names
        return super().state_dict(*a, **kw)

    def forward(self, x):
        m = self.model
        x1 = m["2"](m["1"](x))
        e5 = m["5"](m["4"](m["3"](x1)))
        e7 = m["7"](m["6"](e5))
        e9 = m["9"](m["8"](e7))
        cbl23 = m["23"](e5)
        cbl24 = m["24"](e7)
        cbl25 = m["25"](e9)
        up = lambda t, f: F.interpolate(t, scale_factor=f, mode="nearest")
        y = m["28"](m["27"](m["26"](x)))
        a29 = m["29"](y)
        f30 = a29 + cbl23[0] + up(cbl24[0], 2) + up(cbl25[0], 4)
        p3 = m["31"](f30)
        a32 = m["32"](p3)
        f33 = a32 + cbl24[1] + up(cbl25[1], 2)
        p4 = m["34"](f33)
        f36 = m["35"](p4) + cbl25[2]
        p5 = m["37"](f36)
        return m["38"]([p3, p4, p5])
