"""PyTorch RefineDet-320 reference for parity testing (the
luuuyi/RefineDet.PyTorch module layout the reference's .wts comes from;
refinedet/refinedet.cpp:375-540). Matching state_dict names: vgg.N list
(with dilated fc6 at 31, fc7 at 33), conv4_3/conv5_3 L2Norm, extras,
arm_loc/arm_conf, tcb0/tcb1/tcb2, odm_loc/odm_conf."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class L2Norm(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(ch))

    def forward(self, x):
        n = x.pow(2).sum(dim=1, keepdim=True).add(1e-10).rsqrt()
        return x * n * self.weight.view(1, -1, 1, 1)


def _vgg_layers():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers = []
    cin = 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, v, 3, padding=1), nn.ReLU()]
            cin = v
    # pool5 (2,2 in this variant: refinedet.cpp pools k2 s2) + dilated fc6 + fc7
    layers += [nn.MaxPool2d(2, 2),
               nn.Conv2d(512, 1024, 3, padding=3, dilation=3), nn.ReLU(),
               nn.Conv2d(1024, 1024, 1), nn.ReLU()]
    return layers


class RefineDetTorch(nn.Module):
    def __init__(self, nc=25):
        super().__init__()
        self.vgg = nn.ModuleList(_vgg_layers())
        self.conv4_3_L2Norm = L2Norm(512)
        self.conv5_3_L2Norm = L2Norm(512)
        self.extras = nn.ModuleList([nn.Conv2d(1024, 256, 1),
                                     nn.Conv2d(256, 512, 3, 2, 1)])
        src_ch = (512, 512, 1024, 512)
        self.arm_loc = nn.ModuleList(nn.Conv2d(c, 12, 3, padding=1)
                                     for c in src_ch)
        self.arm_conf = nn.ModuleList(nn.Conv2d(c, 6, 3, padding=1)
                                      for c in src_ch)
        tcb0 = []
        for c in src_ch:
            tcb0 += [nn.Conv2d(c, 256, 3, padding=1), nn.ReLU(),
                     nn.Conv2d(256, 256, 3, padding=1)]
        self.tcb0 = nn.ModuleList(tcb0)
        self.tcb1 = nn.ModuleList(nn.ConvTranspose2d(256, 256, 2, 2)
                                  for _ in range(3))
        tcb2 = []
        for _ in range(4):
            tcb2 += [nn.ReLU(), nn.Conv2d(256, 256, 3, padding=1), nn.ReLU()]
        self.tcb2 = nn.ModuleList(tcb2)
        self.odm_loc = nn.ModuleList(nn.Conv2d(256, 12, 3, padding=1)
                                     for _ in range(4))
        self.odm_conf = nn.ModuleList(nn.Conv2d(256, 3 * nc, 3, padding=1)
                                      for _ in range(4))
        self.nc = nc

    def forward(self, x):
        y = x
        for i in range(23):
            y = self.vgg[i](y)
        c43 = y                       # after relu of vgg.21
        for i in range(23, 30):
            y = self.vgg[i](y)
        c53 = y                       # after relu of vgg.28
        for i in range(30, 35):
            y = self.vgg[i](y)
        fc7 = y
        ex = F.relu(self.extras[1](F.relu(self.extras[0](fc7))))
        f43 = self.conv4_3_L2Norm(c43)
        f53 = self.conv5_3_L2Norm(c53)
        srcs = [f43, f53, fc7, ex]

        flat = lambda t, last: t.permute(0, 2, 3, 1).reshape(
            t.shape[0], -1, last)
        arm_loc = torch.cat([flat(self.arm_loc[i](s), 4)
                             for i, s in enumerate(srcs)], 1)
        arm_conf = torch.cat([flat(self.arm_conf[i](s), 2)
                              for i, s in enumerate(srcs)], 1)

        def tcb0_f(lv, s):
            h = F.relu(self.tcb0[3 * lv](s))
            return self.tcb0[3 * lv + 2](h)

        def tcb2_f(lv, s):
            return F.relu(self.tcb2[3 * lv + 1](F.relu(s)))

        t3 = tcb2_f(3, tcb0_f(3, ex))
        t2 = tcb2_f(2, tcb0_f(2, fc7) + self.tcb1[2](t3))
        t1 = tcb2_f(1, tcb0_f(1, f53) + self.tcb1[1](t2))
        t0 = tcb2_f(0, tcb0_f(0, f43) + self.tcb1[0](t1))
        odms = [t0, t1, t2, t3]
        odm_loc = torch.cat([flat(self.odm_loc[i](s), 4)
                             for i, s in enumerate(odms)], 1)
        odm_conf = torch.cat([flat(self.odm_conf[i](s), self.nc)
                              for i, s in enumerate(odms)], 1)
        return (arm_loc, F.softmax(arm_conf, -1),
                odm_loc, F.softmax(odm_conf, -1))
