"""PyTorch YOLOv12 reference (A2C2f area-attention graph) for parity testing.

Mirrors the ultralytics-style module graph the reference's .wts comes from
(yolov12/src/model.cpp:227 buildEngineYolov12Det, block.cpp:459 A2C2f,
:499 ABlock, :520 AAttn) with matching state_dict names (model.N.*).
"""

import math

import torch
import torch.nn as nn

from torch_refs.yolo11_torch import (C3k, C3k2, Conv, Detect, Proto, SegExtra,
                                     get_depth, get_width)

_ATTN_SCALE = 0.176777  # block.cpp:526


class AAttn(nn.Module):
    def __init__(self, dim, num_heads, area=1):
        super().__init__()
        self.area = area
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = Conv(dim, dim * 3, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 7, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x).flatten(2).transpose(1, 2)          # (B, N, 3C)
        if self.area > 1:
            qkv = qkv.reshape(B * self.area, N // self.area, C * 3)
            B_, N_ = qkv.shape[:2]
        else:
            B_, N_ = B, N
        q, k, v = qkv.view(B_, N_, self.num_heads,
                           self.head_dim * 3).split(
            [self.head_dim, self.head_dim, self.head_dim], dim=3)
        attn = (q.transpose(1, 2) @ k.transpose(1, 2).transpose(-2, -1)) \
            * _ATTN_SCALE
        attn = attn.softmax(dim=-1)
        o = (attn @ v.transpose(1, 2)).transpose(1, 2)        # (B_, N_, nh, hd)
        o = o.reshape(B, N, C)
        v = v.reshape(B, N, C)
        o = o.transpose(1, 2).reshape(B, C, H, W)
        v = v.transpose(1, 2).reshape(B, C, H, W)
        o = o + self.pe(v)
        return self.proj(o)


class ABlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=2.0, area=1):
        super().__init__()
        self.attn = AAttn(dim, num_heads=num_heads, area=area)
        mlp_hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(Conv(dim, mlp_hidden, 1),
                                 Conv(mlp_hidden, dim, 1, act=False))

    def forward(self, x):
        x = x + self.attn(x)
        return x + self.mlp(x)


class A2C2f(nn.Module):
    def __init__(self, c1, c2, n=1, a2=True, area=1, e=0.25):
        super().__init__()
        c_ = 2 * int(c2 * e)
        self.a2 = a2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv((1 + n) * c_ if a2 else 2 * c_, c2, 1, 1)
        if a2:
            self.m = nn.ModuleList(
                nn.Sequential(*(ABlock(c_, c_ // 32, 2.0, area)
                                for _ in range(2))) for _ in range(n))
        else:
            self.m = nn.ModuleList([C3k(c_, c_, 2, True)])

    def forward(self, x):
        y = [self.cv1(x)]
        if self.a2:
            for pair in self.m:
                y.append(pair(y[-1]))
        else:
            y.append(self.m[0](y[0]))
        return self.cv2(torch.cat(y, 1))


class Yolov12Torch(nn.Module):
    """v12 det graph (n/s scales: plain-bottleneck C3k2) with seg/pose extras."""

    def __init__(self, nc=80, scale="n", task="det", num_kpts=17):
        super().__init__()
        gd, gw, maxc = {"n": (0.5, 0.25, 1024), "s": (0.5, 0.5, 1024),
                        "m": (0.5, 1.0, 512), "l": (1.0, 1.0, 512),
                        "x": (1.0, 1.5, 512)}[scale]
        w = lambda x: get_width(x, gw, maxc)
        d = lambda x: get_depth(x, gd)
        c3k = scale in ("m", "l", "x")
        self.task = task
        layers = [
            Conv(3, w(64), 3, 2),                               # 0
            Conv(w(64), w(128), 3, 2),                          # 1
            C3k2(w(128), w(256), d(2), c3k, e=0.25),            # 2
            Conv(w(256), w(256), 3, 2),                         # 3
            C3k2(w(256), w(512), d(2), c3k, e=0.25),            # 4
            Conv(w(512), w(512), 3, 2),                         # 5
            A2C2f(w(512), w(512), 2, True, area=4),             # 6
            Conv(w(512), w(1024), 3, 2),                        # 7
            A2C2f(w(1024), w(1024), 2, True, area=1),           # 8
            nn.Upsample(scale_factor=2), nn.Identity(),         # 9 10
            A2C2f(w(1024) + w(512), w(512), 1, False),          # 11
            nn.Upsample(scale_factor=2), nn.Identity(),         # 12 13
            A2C2f(w(512) + w(512), w(256), 1, False),           # 14
            Conv(w(256), w(256), 3, 2), nn.Identity(),          # 15 16
            A2C2f(w(256) + w(512), w(512), 1, False),           # 17
            Conv(w(512), w(512), 3, 2), nn.Identity(),          # 18 19
            C3k2(w(512) + w(1024), w(1024), d(2), True, e=0.5),  # 20
        ]
        ch = (w(256), w(512), w(1024))
        det = Detect(nc=nc, ch=ch)
        if task == "seg":
            det.cv4 = SegExtra(ch, max(w(256) // 4, 32), 32)
            det.proto = Proto(ch[0], w(256), 32)
        elif task == "pose":
            det.cv4 = SegExtra(ch, max(w(256) // 4, num_kpts * 3),
                               num_kpts * 3)
        layers.append(det)                                      # 21
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        y = m[2](m[1](m[0](x)))
        c4 = m[4](m[3](y))
        c6 = m[6](m[5](c4))
        c8 = m[8](m[7](c6))
        c11 = m[11](torch.cat([m[9](c8), c6], 1))
        p3 = m[14](torch.cat([m[12](c11), c4], 1))
        p4 = m[17](torch.cat([m[15](p3), c11], 1))
        p5 = m[20](torch.cat([m[18](p4), c8], 1))
        feats = [p3, p4, p5]
        out = {"head": m[21](feats)}
        if self.task in ("seg", "pose"):
            out["cv4"] = m[21].cv4(feats)
        if self.task == "seg":
            out["proto"] = m[21].proto(p3)
        return out
