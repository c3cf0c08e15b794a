"""MobileNetV3-small parity vs a kuan-wang-layout torch reference."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.mobilenetv3 import SMALL
from torch_refs.yolo11_torch import randomize


def hswish(x):
    return x * F.relu6(x + 3) / 6


def hsig(x):
    return F.relu6(x + 3) / 6


class SE(tnn.Module):
    def __init__(self, ch, red):
        super().__init__()
        self.fc = tnn.Sequential(tnn.Linear(ch, red), tnn.ReLU(True),
                                 tnn.Linear(red, ch))

    def forward(self, x):
        w = hsig(self.fc(x.mean([2, 3])))
        return x * w[:, :, None, None]


class Block(tnn.Module):
    def __init__(self, cin, cout, s, hid, k, se, hs):
        super().__init__()
        self.meta = (cin, cout, s)
        mods = []
        if cin != hid:
            mods += [tnn.Conv2d(cin, hid, 1, bias=False), tnn.BatchNorm2d(hid),
                     tnn.Identity(),
                     tnn.Conv2d(hid, hid, k, s, (k - 1) // 2, groups=hid,
                                bias=False), tnn.BatchNorm2d(hid)]
            mods += [SE(hid, hid // 4) if se else tnn.Identity(),
                     tnn.Identity(),
                     tnn.Conv2d(hid, cout, 1, bias=False), tnn.BatchNorm2d(cout)]
        else:
            mods += [tnn.Conv2d(hid, hid, k, s, (k - 1) // 2, groups=hid,
                                bias=False), tnn.BatchNorm2d(hid),
                     tnn.Identity(),
                     SE(hid, hid // 4) if se else tnn.Identity(),
                     tnn.Conv2d(hid, cout, 1, bias=False), tnn.BatchNorm2d(cout)]
        self.conv = tnn.Sequential(*mods)
        self.hs = hs
        self.se_flag = se
        self.hid_eq = cin == hid

    def forward(self, x):
        act = hswish if self.hs else F.relu
        c = self.conv
        if self.hid_eq:
            y = c[1](c[0](x))         # dw + bn
            y = act(y)
            y = c[3](y)               # se / identity
            y = c[5](c[4](y))         # pw + bn
        else:
            y = act(c[1](c[0](x)))    # expand
            y = c[4](c[3](y))         # dw + bn
            y = c[5](y)               # se / identity
            y = act(y)
            y = c[8](c[7](y))         # project
        cin, cout, s = self.meta
        return x + y if (s == 1 and cin == cout) else y


class TorchMBV3Small(tnn.Module):
    def __init__(self, nc=10):
        super().__init__()
        f0 = tnn.Sequential(tnn.Conv2d(3, 16, 3, 2, 1, bias=False),
                            tnn.BatchNorm2d(16))
        feats = [f0] + [Block(*row) for row in SMALL]
        self.features = tnn.Sequential(*feats)
        conv0 = tnn.Sequential(tnn.Conv2d(96, 576, 1, bias=False),
                               tnn.BatchNorm2d(576))
        self.conv = tnn.Sequential(conv0, SE(576, 144))
        self.classifier = tnn.Sequential(
            tnn.Linear(576, 1280), tnn.BatchNorm1d(1280), tnn.Identity(),
            tnn.Linear(1280, nc), tnn.BatchNorm1d(nc))

    def forward(self, x):
        y = hswish(self.features[0](x))
        for blk in self.features[1:]:
            y = blk(y)
        y = hswish(self.conv[0](y))
        y = self.conv[1](y)
        y = hswish(y.mean([2, 3]))
        c = self.classifier
        y = hswish(c[1](c[0](y)))
        return hswish(c[4](c[3](y)))


def test_mobilenetv3_small_parity(tmp_path, rng):
    tm = randomize(TorchMBV3Small(), seed=91).eval()
    wts = tmp_path / "mb3.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("mobilenetv3", str(wts), num_classes=10,
                       input_h=96, input_w=96)
    x = rng.uniform(-1, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
