"""PyTorch CenterNet (DLA34 + DCNv2) reference for parity testing.

Mirrors the xingyizhou/CenterNet pose_dla_dcn module graph the reference's
TRT builder consumes (centernet/centernet.py: add_tree :111-143, DLAUp/IDAUp
:171-243, heads :245-257), with matching "module."-prefixed state_dict
names. DCNv2 is implemented here with explicit bilinear sampling (the
dcn_v2_im2col_cuda.cu semantics: zero outside, per-corner validity)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


def dcn_v2_torch(x, offset, mask, weight, bias):
    """Modulated deformable conv 3x3 s1 p1. x (B,C,H,W); offset (B,18,H,W)
    as (dy, dx) per tap; mask (B,9,H,W) already sigmoided."""
    B, C, H, W = x.shape
    ys = torch.arange(H, dtype=torch.float32).view(1, H, 1)
    xs = torch.arange(W, dtype=torch.float32).view(1, 1, W)
    flat = x.reshape(B, C, H * W)
    cols = []
    k = 0
    for ky in range(3):
        for kx in range(3):
            py = ys + (ky - 1) + offset[:, 2 * k]
            px = xs + (kx - 1) + offset[:, 2 * k + 1]
            val = 0
            y0 = torch.floor(py)
            x0 = torch.floor(px)
            for dy in (0, 1):
                for dx in (0, 1):
                    yy = y0 + dy
                    xx = x0 + dx
                    wgt = ((1 - (py - y0) if dy == 0 else (py - y0))
                           * (1 - (px - x0) if dx == 0 else (px - x0)))
                    valid = ((yy >= 0) & (yy < H) & (xx >= 0)
                             & (xx < W)).float()
                    idx = (yy.clamp(0, H - 1) * W
                           + xx.clamp(0, W - 1)).long().view(B, 1, H * W)
                    g = torch.gather(flat, 2, idx.expand(B, C, H * W))
                    val = val + g.view(B, C, H, W) * (wgt * valid).unsqueeze(1)
            cols.append(val * mask[:, k].unsqueeze(1))
            k += 1
    col = torch.stack(cols, 2)                       # (B, C, 9, H, W)
    w = weight.reshape(weight.shape[0], C * 9)
    out = torch.einsum("ok,bkhw->bohw", w,
                       col.permute(0, 1, 2, 3, 4).reshape(B, C * 9, H, W))
    return out + bias.view(1, -1, 1, 1)


class DCN(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.weight = nn.Parameter(torch.zeros(co, ci, 3, 3))
        self.bias = nn.Parameter(torch.zeros(co))
        self.conv_offset_mask = nn.Conv2d(ci, 27, 3, padding=1)

    def forward(self, x):
        om = self.conv_offset_mask(x)
        offset = om[:, :18]
        mask = torch.sigmoid(om[:, 18:])
        return dcn_v2_torch(x, offset, mask, self.weight, self.bias)


class DeformConv(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.actf = nn.Sequential(nn.BatchNorm2d(co), nn.ReLU())
        self.conv = DCN(ci, co)

    def forward(self, x):
        return self.actf(self.conv(x))


class BasicBlock(nn.Module):
    def __init__(self, ci, co, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(ci, co, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(co)
        self.conv2 = nn.Conv2d(co, co, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(co)

    def forward(self, x, residual=None):
        if residual is None:
            residual = x
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + residual)


class Root(nn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, 1, bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, *xs):
        return F.relu(self.bn(self.conv(torch.cat(xs, 1))))


class Tree(nn.Module):
    def __init__(self, levels, ci, co, stride=1, level_root=False,
                 root_dim=0):
        super().__init__()
        if root_dim == 0:
            root_dim = 2 * co
        if level_root:
            root_dim += ci
        self.levels = levels
        self.level_root = level_root
        if levels == 1:
            self.tree1 = BasicBlock(ci, co, stride)
            self.tree2 = BasicBlock(co, co, 1)
            self.root = Root(root_dim, co)
        else:
            self.tree1 = Tree(levels - 1, ci, co, stride, root_dim=0)
            self.tree2 = Tree(levels - 1, co, co, root_dim=root_dim + co)
        if stride > 1:
            self.downsample = nn.MaxPool2d(stride, stride)
        if ci != co:
            self.project = nn.Sequential(nn.Conv2d(ci, co, 1, bias=False),
                                         nn.BatchNorm2d(co))

    def forward(self, x, residual=None, children=None):
        children = [] if children is None else children
        bottom = self.downsample(x) if hasattr(self, "downsample") else x
        residual = (self.project(bottom) if hasattr(self, "project")
                    else bottom)
        if self.level_root:
            children.append(bottom)
        x1 = self.tree1(x, residual)
        if self.levels == 1:
            x2 = self.tree2(x1)
            return self.root(x2, x1, *children)
        children.append(x1)
        return self.tree2(x1, children=children)


class DLA34(nn.Module):
    def __init__(self):
        super().__init__()
        self.base_layer = nn.Sequential(nn.Conv2d(3, 16, 7, 1, 3, bias=False),
                                        nn.BatchNorm2d(16), nn.ReLU())
        self.level0 = nn.Sequential(nn.Conv2d(16, 16, 3, 1, 1, bias=False),
                                    nn.BatchNorm2d(16), nn.ReLU())
        self.level1 = nn.Sequential(nn.Conv2d(16, 32, 3, 2, 1, bias=False),
                                    nn.BatchNorm2d(32), nn.ReLU())
        self.level2 = Tree(1, 32, 64, 2, False)
        self.level3 = Tree(2, 64, 128, 2, True)
        self.level4 = Tree(2, 128, 256, 2, True)
        self.level5 = Tree(1, 256, 512, 2, True)

    def forward(self, x):
        y = self.level1(self.level0(self.base_layer(x)))
        outs = []
        for lv in (self.level2, self.level3, self.level4, self.level5):
            y = lv(y)
            outs.append(y)
        return outs                  # [l2, l3, l4, l5]


class IDAUp(nn.Module):
    def __init__(self, co, chans, up_f):
        super().__init__()
        for i in range(1, len(chans)):
            f = int(up_f[i])
            setattr(self, f"proj_{i}", DeformConv(chans[i], co))
            setattr(self, f"up_{i}", nn.ConvTranspose2d(
                co, co, f * 2, stride=f, padding=f // 2, groups=co,
                bias=False))
            setattr(self, f"node_{i}", DeformConv(co, co))

    def forward(self, layers, startp, endp):
        for i in range(startp + 1, endp):
            k = i - startp
            proj = getattr(self, f"proj_{k}")(layers[i])
            up = getattr(self, f"up_{k}")(proj)
            layers[i] = getattr(self, f"node_{k}")(layers[i - 1] + up)
        return layers


class CenterNetTorch(nn.Module):
    """DLASeg(pose_dla_dcn) with the DataParallel "module." prefix."""

    def __init__(self, nc=80):
        super().__init__()
        m = nn.Module()
        m.base = DLA34()
        m.dla_up = nn.Module()
        m.dla_up.ida_0 = IDAUp(256, [64, 128, 256, 512][2:], [1, 2])
        m.dla_up.ida_1 = IDAUp(128, [128, 256, 256], [1, 2, 2])
        m.dla_up.ida_2 = IDAUp(64, [64, 128, 128, 128], [1, 2, 2, 2])
        m.ida_up = IDAUp(64, [64, 128, 256], [1, 2, 4])
        for head, ch in (("hm", nc), ("wh", 2), ("reg", 2)):
            setattr(m, head, nn.Sequential(
                nn.Conv2d(64, 256, 3, padding=1), nn.ReLU(),
                nn.Conv2d(256, ch, 1)))
        self.module = m

    def forward(self, x):
        m = self.module
        layers = m.base(x)                       # [l2, l3, l4, l5]
        out = [layers[-1]]
        # DLAUp: ida_i over the tail, updated in place
        layers = m.dla_up.ida_0(layers, 2, 4)
        out.insert(0, layers[-1])
        layers = m.dla_up.ida_1(layers, 1, 4)
        out.insert(0, layers[-1])
        layers = m.dla_up.ida_2(layers, 0, 4)
        out.insert(0, layers[-1])
        y = [out[0], out[1], out[2]]
        m.ida_up(y, 0, 3)
        feat = y[-1]
        return {"hm": torch.sigmoid(m.hm(feat)), "wh": m.wh(feat),
                "reg": m.reg(feat)}
