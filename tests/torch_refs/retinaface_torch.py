"""PyTorch RetinaFace-R50 reference for parity testing (the
biubug6/Pytorch_Retinaface module layout the reference's .wts comes from;
retinaface/retina_r50.cpp). Matching names: body.* (torchvision resnet50),
fpn.output1-3 / fpn.merge1-2, ssh1-3, {Bbox,Class,Landmark}Head.N.conv1x1."""

import torch
import torch.nn as nn
import torch.nn.functional as F

from torch_refs.resnet_torch import Bottleneck, ResNet


def _cbr(ci, co, k, s=1):
    return nn.Sequential(nn.Conv2d(ci, co, k, s, k // 2, bias=False),
                         nn.BatchNorm2d(co))


class SSH(nn.Module):
    def __init__(self, ci=256, co=256):
        super().__init__()
        self.conv3X3 = _cbr(ci, co // 2, 3)
        self.conv5X5_1 = _cbr(ci, co // 4, 3)
        self.conv5X5_2 = _cbr(co // 4, co // 4, 3)
        self.conv7X7_2 = _cbr(co // 4, co // 4, 3)
        self.conv7x7_3 = _cbr(co // 4, co // 4, 3)

    def forward(self, x):
        a = self.conv3X3(x)
        b1 = F.relu(self.conv5X5_1(x))
        b = self.conv5X5_2(b1)
        c = self.conv7x7_3(F.relu(self.conv7X7_2(b1)))
        return F.relu(torch.cat([a, b, c], 1))


class RetinaFaceTorch(nn.Module):
    def __init__(self):
        super().__init__()
        self.body = ResNet(Bottleneck, [3, 4, 6, 3])
        self.fpn = nn.Module()
        self.fpn.output1 = _cbr(512, 256, 1)
        self.fpn.output2 = _cbr(1024, 256, 1)
        self.fpn.output3 = _cbr(2048, 256, 1)
        self.fpn.merge1 = _cbr(256, 256, 3)
        self.fpn.merge2 = _cbr(256, 256, 3)
        self.ssh1 = SSH()
        self.ssh2 = SSH()
        self.ssh3 = SSH()
        for nm, ch in (("BboxHead", 8), ("ClassHead", 4),
                       ("LandmarkHead", 20)):
            heads = nn.ModuleList()
            for _ in range(3):
                h = nn.Module()
                h.conv1x1 = nn.Conv2d(256, ch, 1)
                heads.append(h)
            setattr(self, nm, heads)

    def forward(self, x):
        b = self.body
        y = F.relu(b.bn1(b.conv1(x)))
        y = F.max_pool2d(y, 3, 2, 1)
        y = b.layer1(y)
        c2 = b.layer2(y)
        c3 = b.layer3(c2)
        c4 = b.layer4(c3)
        up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
        o1 = F.relu(self.fpn.output1(c2))
        o2 = F.relu(self.fpn.output2(c3))
        o3 = F.relu(self.fpn.output3(c4))
        o2 = F.relu(self.fpn.merge2(o2 + up(o3)))
        o1 = F.relu(self.fpn.merge1(o1 + up(o2)))
        feats = [self.ssh1(o1), self.ssh2(o2), self.ssh3(o3)]
        out = []
        for i, f in enumerate(feats):
            out.append((self.BboxHead[i].conv1x1(f),
                        self.ClassHead[i].conv1x1(f),
                        self.LandmarkHead[i].conv1x1(f)))
        return out
