"""Minimal PyTorch YOLO11 reference for parity testing.

Re-implements the ultralytics module graph (the source of the .wts files the
reference consumes) with matching state_dict names (model.N.*). Used only in
tests: random weights → .wts → tensorrtx_tpu engine → compare outputs.
"""

import math

import torch
import torch.nn as nn


def autopad(k):
    return k // 2


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True, p=None):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k) if p is None else p,
                              groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv2(self.cv1(x)) if self.add else self.cv2(self.cv1(x))


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(Bottleneck(c_, c_, shortcut, g, k=(1, 3), e=1.0)
                                 for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k(C3):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = nn.Sequential(*(Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0)
                                 for _ in range(n)))


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=1.0) for _ in range(n))

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class C3k2(C2f):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g) if c3k
            else Bottleneck(self.c, self.c, shortcut, g, k=(3, 3), e=0.5)
            for _ in range(n))


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(B, self.num_heads, self.key_dim * 2 + self.head_dim,
                           N).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(v.reshape(B, C, H, W))
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, attn_ratio=attn_ratio, num_heads=num_heads)
        self.ffn = nn.Sequential(Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False))
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        x = x + self.ffn(x) if self.add else self.ffn(x)
        return x


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(*(PSABlock(self.c, attn_ratio=0.5,
                                          num_heads=self.c // 64) for _ in range(n)))

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class Detect(nn.Module):
    """Detect head; forward returns per-level (box_dist, cls) raw maps."""

    def __init__(self, nc=80, ch=(), reg_max=16):
        super().__init__()
        self.nc = nc
        self.reg_max = reg_max
        c2 = max((16, ch[0] // 4, reg_max * 4))
        c3 = max(ch[0], min(nc, 100))
        self.cv2 = nn.ModuleList(
            nn.Sequential(Conv(x, c2, 3), Conv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for x in ch)
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, nc, 1)) for x in ch)
        # dfl.conv exists in checkpoints; create it so the .wts has the key
        self.dfl = nn.Module()
        self.dfl.conv = nn.Conv2d(reg_max, 1, 1, bias=False)
        self.dfl.conv.weight.data = torch.arange(reg_max, dtype=torch.float32).view(1, reg_max, 1, 1)

    def forward(self, feats):
        return [(self.cv2[i](f), self.cv3[i](f)) for i, f in enumerate(feats)]


class SegExtra(nn.ModuleList):
    """cv4 branch used by seg (32 coeffs), pose (3*nkpt), obb (1 angle).
    Subclasses ModuleList so state_dict names match ultralytics (cv4.i.j...)."""

    def __init__(self, ch, cmid, cout):
        super().__init__(
            nn.Sequential(Conv(x, cmid, 3), Conv(cmid, cmid, 3),
                          nn.Conv2d(cmid, cout, 1)) for x in ch)

    def forward(self, feats):
        return [self[i](f) for i, f in enumerate(feats)]


class Proto(nn.Module):
    def __init__(self, c1, c_=256, c2=32):
        super().__init__()
        self.cv1 = Conv(c1, c_, k=3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = Conv(c_, c_, k=3)
        self.cv3 = Conv(c_, c2)

    def forward(self, x):
        return self.cv3(self.cv2(torch.nn.functional.silu(self.upsample(self.cv1(x)))))


def get_width(x, gw, maxc, divisor=8):
    return int(math.ceil(min(x, maxc) * gw / divisor)) * divisor


def get_depth(x, gd):
    if x == 1:
        return 1
    return max(round(x * gd), 1)


class Yolo11Torch(nn.Module):
    """Full det graph with ultralytics layer indices for state_dict parity."""

    def __init__(self, scale="n", nc=80, task="det", num_kpts=17):
        super().__init__()
        gd, gw, maxc = {"n": (0.5, 0.25, 1024), "s": (0.5, 0.5, 1024),
                        "m": (0.5, 1.0, 512), "l": (1.0, 1.0, 512),
                        "x": (1.0, 1.5, 512)}[scale]
        w = lambda x: get_width(x, gw, maxc)
        d = lambda x: get_depth(x, gd)
        c3k = scale in ("m", "l", "x")
        self.task = task
        layers = [
            Conv(3, w(64), 3, 2),                                   # 0
            Conv(w(64), w(128), 3, 2),                              # 1
            C3k2(w(128), w(256), d(2), c3k, e=0.25),                # 2
            Conv(w(256), w(256), 3, 2),                             # 3
            C3k2(w(256), w(512), d(2), c3k, e=0.25),                # 4
            Conv(w(512), w(512), 3, 2),                             # 5
            C3k2(w(512), w(512), d(2), True, e=0.5),                # 6
            Conv(w(512), w(1024), 3, 2),                            # 7
            C3k2(w(1024), w(1024), d(2), True, e=0.5),              # 8
            SPPF(w(1024), w(1024), 5),                              # 9
            C2PSA(w(1024), w(1024), d(2)),                          # 10
            nn.Upsample(scale_factor=2, mode="nearest"),            # 11
            nn.Identity(),                                          # 12 concat
            C3k2(w(1024) + w(512), w(512), d(2), c3k, e=0.5),       # 13
            nn.Upsample(scale_factor=2, mode="nearest"),            # 14
            nn.Identity(),                                          # 15 concat
            C3k2(w(512) + w(512), w(256), d(2), c3k, e=0.5),        # 16
            Conv(w(256), w(256), 3, 2),                             # 17
            nn.Identity(),                                          # 18 concat
            C3k2(w(256) + w(512), w(512), d(2), c3k, e=0.5),        # 19
            Conv(w(512), w(512), 3, 2),                             # 20
            nn.Identity(),                                          # 21 concat
            C3k2(w(512) + w(1024), w(1024), d(2), True, e=0.5),     # 22
        ]
        ch = (w(256), w(512), w(1024))
        det = Detect(nc=nc, ch=ch)
        if task == "seg":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, 32), 32)
            det.proto = Proto(ch[0], max(ch[0] // 4, 32), 32)
        elif task == "pose":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, num_kpts * 3), num_kpts * 3)
        elif task == "obb":
            det.cv4 = SegExtra(ch, max(ch[0] // 4, 1), 1)
        layers.append(det)                                          # 23
        self.model = nn.ModuleList(layers)

    def forward(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        c4 = m[4](x)
        x = m[5](c4)
        c6 = m[6](x)
        x = m[7](c6)
        x = m[8](x)
        x = m[9](x)
        p5_in = m[10](x)
        u = m[11](p5_in)
        x = m[13](torch.cat([u, c6], 1))
        p4_mid = x
        u = m[14](x)
        p3 = m[16](torch.cat([u, c4], 1))
        x = m[17](p3)
        p4 = m[19](torch.cat([x, p4_mid], 1))
        x = m[20](p4)
        p5 = m[22](torch.cat([x, p5_in], 1))
        feats = [p3, p4, p5]
        out = {"head": m[23](feats)}
        if self.task in ("seg", "pose", "obb"):
            out["cv4"] = m[23].cv4(feats)
        if self.task == "seg":
            out["proto"] = m[23].proto(p3)
        return out


def randomize(model: nn.Module, seed=0):
    """Random weights AND random BN stats so folding is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, (nn.Conv2d, nn.ConvTranspose2d, nn.Linear)):
                mod.weight.normal_(0, 0.05, generator=g)
                if mod.bias is not None:
                    mod.bias.normal_(0, 0.05, generator=g)
            elif isinstance(mod, nn.BatchNorm2d):
                mod.weight.uniform_(0.5, 1.5, generator=g)
                mod.bias.normal_(0, 0.1, generator=g)
                mod.running_mean.normal_(0, 0.1, generator=g)
                mod.running_var.uniform_(0.5, 1.5, generator=g)
    # keep DFL weights fixed at arange
    for mod in model.modules():
        if isinstance(mod, Detect):
            mod.dfl.conv.weight.data = torch.arange(
                mod.reg_max, dtype=torch.float32).view(1, mod.reg_max, 1, 1)
    return model
