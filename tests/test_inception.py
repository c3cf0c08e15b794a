"""Inception-v3 parity vs a torchvision-layout torch reference."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize


class BC(tnn.Module):
    def __init__(self, ci, co, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(co, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class IncA(tnn.Module):
    def __init__(self, cin, pf):
        super().__init__()
        self.branch1x1 = BC(cin, 64, 1)
        self.branch5x5_1 = BC(cin, 48, 1)
        self.branch5x5_2 = BC(48, 64, 5, p=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, p=1)
        self.branch_pool = BC(cin, pf, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class IncB(tnn.Module):
    def __init__(self, cin=288):
        super().__init__()
        self.branch3x3 = BC(cin, 384, 3, s=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, p=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, 2)], 1)


class IncC(tnn.Module):
    def __init__(self, c7, cin=768):
        super().__init__()
        self.branch1x1 = BC(cin, 192, 1)
        self.branch7x7_1 = BC(cin, c7, 1)
        self.branch7x7_2 = BC(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7_3 = BC(c7, 192, (7, 1), p=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, 1)
        self.branch7x7dbl_2 = BC(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, (1, 7), p=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, (7, 1), p=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, (1, 7), p=(0, 3))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        d = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x),
            self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x))),
            d, self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class IncD(tnn.Module):
    def __init__(self, cin=768):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, 1)
        self.branch3x3_2 = BC(192, 320, 3, s=2)
        self.branch7x7x3_1 = BC(cin, 192, 1)
        self.branch7x7x3_2 = BC(192, 192, (1, 7), p=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, (7, 1), p=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, 3, s=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, 2)], 1)


class IncE(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BC(cin, 320, 1)
        self.branch3x3_1 = BC(cin, 384, 1)
        self.branch3x3_2a = BC(384, 384, (1, 3), p=(0, 1))
        self.branch3x3_2b = BC(384, 384, (3, 1), p=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, 1)
        self.branch3x3dbl_2 = BC(448, 384, 3, p=1)
        self.branch3x3dbl_3a = BC(384, 384, (1, 3), p=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, (3, 1), p=(1, 0))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        d = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        d = torch.cat([self.branch3x3dbl_3a(d), self.branch3x3dbl_3b(d)], 1)
        return torch.cat([self.branch1x1(x), b3, d,
                          self.branch_pool(F.avg_pool2d(x, 3, 1, 1))], 1)


class TorchInceptionV3(tnn.Module):
    def __init__(self, nc=10):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, 3, s=2)
        self.Conv2d_2a_3x3 = BC(32, 32, 3)
        self.Conv2d_2b_3x3 = BC(32, 64, 3, p=1)
        self.Conv2d_3b_1x1 = BC(64, 80, 1)
        self.Conv2d_4a_3x3 = BC(80, 192, 3)
        self.Mixed_5b = IncA(192, 32)
        self.Mixed_5c = IncA(256, 64)
        self.Mixed_5d = IncA(288, 64)
        self.Mixed_6a = IncB()
        self.Mixed_6b = IncC(128)
        self.Mixed_6c = IncC(160)
        self.Mixed_6d = IncC(160)
        self.Mixed_6e = IncC(192)
        self.Mixed_7a = IncD()
        self.Mixed_7b = IncE(1280)
        self.Mixed_7c = IncE(2048)
        self.fc = tnn.Linear(2048, nc)

    def forward(self, x):
        y = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        y = F.max_pool2d(y, 3, 2)
        y = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(y))
        y = F.max_pool2d(y, 3, 2)
        y = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(y)))
        y = self.Mixed_6a(y)
        y = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(y))))
        y = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(y)))
        return self.fc(F.adaptive_avg_pool2d(y, 1).flatten(1))


def test_inception_v3_parity(tmp_path, rng):
    tm = randomize(TorchInceptionV3(), seed=73).eval()
    wts = tmp_path / "iv3.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("inception", str(wts), num_classes=10,
                       input_h=299, input_w=299)
    x = rng.uniform(-1, 1, (1, 3, 299, 299)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
