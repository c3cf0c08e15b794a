"""RepVGG, IBN-Net-a, MnasNet parity."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize


def test_repvgg_a0(tmp_path, rng):
    class Block(tnn.Module):
        def __init__(self, ci, co, s):
            super().__init__()
            self.rbr_reparam = tnn.Conv2d(ci, co, 3, s, 1)

        def forward(self, x):
            return F.relu(self.rbr_reparam(x))

    class RepVGG(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            blocks, widths = [2, 4, 14, 1], [0.75, 0.75, 0.75, 2.5]
            inp = min(64, int(64 * widths[0]))
            self.stage0 = Block(3, inp, 2)
            cin = inp
            for si, n in enumerate(blocks):
                cout = int(64 * 2 ** si * widths[si])
                stage = []
                for bi in range(n):
                    stage.append(Block(cin, cout, 2 if bi == 0 else 1))
                    cin = cout
                setattr(self, f"stage{si + 1}", tnn.Sequential(*stage))
            self.linear = tnn.Linear(cin, nc)

        def forward(self, x):
            y = self.stage0(x)
            y = self.stage4(self.stage3(self.stage2(self.stage1(y))))
            return self.linear(y.mean([2, 3]))

    tm = randomize(RepVGG(), seed=61).eval()
    wts = tmp_path / "rv.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("repvgg", str(wts), variant="a0", num_classes=10,
                       input_h=64, input_w=64)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


def test_ibnnet_a(tmp_path, rng):
    class IBN(tnn.Module):
        def __init__(self, planes):
            super().__init__()
            self.half = planes // 2
            self.IN = tnn.InstanceNorm2d(self.half, affine=True)
            self.BN = tnn.BatchNorm2d(self.half)

        def forward(self, x):
            a, b = torch.split(x, self.half, 1)
            return torch.cat([self.IN(a), self.BN(b)], 1)

    class Bottleneck(tnn.Module):
        def __init__(self, inp, planes, stride=1, down=None, ibn=True):
            super().__init__()
            self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
            self.bn1 = IBN(planes) if ibn else tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = down

        def forward(self, x):
            idt = x
            y = F.relu(self.bn1(self.conv1(x)))
            y = F.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            if self.downsample is not None:
                idt = self.downsample(x)
            return F.relu(y + idt)

    class IBNNet(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            inp = 64
            for li, n in enumerate((3, 4, 6, 3)):
                planes = 64 * 2 ** li
                blocks = []
                for bi in range(n):
                    s = (1 if li == 0 else 2) if bi == 0 else 1
                    down = tnn.Sequential(
                        tnn.Conv2d(inp, planes * 4, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * 4)) if bi == 0 else None
                    blocks.append(Bottleneck(inp, planes, s, down, ibn=li < 3))
                    inp = planes * 4
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))
            self.fc = tnn.Linear(2048, nc)

        def forward(self, x):
            y = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2, 1)
            y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
            return self.fc(y.mean([2, 3]))

    tm = randomize(IBNNet(), seed=63).eval()
    wts = tmp_path / "ibn.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("ibnnet", str(wts), num_classes=10, input_h=64, input_w=64)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


def test_mnasnet05(tmp_path, rng):
    def round8(v):
        new = max(8, int(v + 4) // 8 * 8)
        return new + 8 if new < 0.9 * v else new

    class InvRes(tnn.Module):
        def __init__(self, ci, co, k, s, e):
            super().__init__()
            hid = ci * e
            self.layers = tnn.Sequential(
                tnn.Conv2d(ci, hid, 1, bias=False), tnn.BatchNorm2d(hid),
                tnn.ReLU(True),
                tnn.Conv2d(hid, hid, k, s, k // 2, groups=hid, bias=False),
                tnn.BatchNorm2d(hid), tnn.ReLU(True),
                tnn.Conv2d(hid, co, 1, bias=False), tnn.BatchNorm2d(co))
            self.skip = s == 1 and ci == co

        def forward(self, x):
            y = self.layers(x)
            return x + y if self.skip else y

    class MnasNet(tnn.Module):
        def __init__(self, alpha=0.5, nc=10):
            super().__init__()
            d = [round8(v * alpha) for v in [32, 16, 24, 40, 80, 96, 192, 320]]
            stacks = [(3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3), (3, 1, 6, 2),
                      (5, 2, 6, 4), (3, 1, 6, 1)]
            mods = [tnn.Conv2d(3, d[0], 3, 2, 1, bias=False), tnn.BatchNorm2d(d[0]),
                    tnn.ReLU(True),
                    tnn.Conv2d(d[0], d[0], 3, 1, 1, groups=d[0], bias=False),
                    tnn.BatchNorm2d(d[0]), tnn.ReLU(True),
                    tnn.Conv2d(d[0], d[1], 1, bias=False), tnn.BatchNorm2d(d[1])]
            cin = d[1]
            for si, (k, s, e, r) in enumerate(stacks):
                blocks = []
                for bi in range(r):
                    blocks.append(InvRes(cin, d[si + 2], k, s if bi == 0 else 1, e))
                    cin = d[si + 2]
                mods.append(tnn.Sequential(*blocks))
            mods += [tnn.Conv2d(cin, 1280, 1, bias=False), tnn.BatchNorm2d(1280),
                     tnn.ReLU(True)]
            self.layers = tnn.Sequential(*mods)
            self.classifier = tnn.Sequential(tnn.Identity(), tnn.Linear(1280, nc))

        def forward(self, x):
            return self.classifier(self.layers(x).mean([2, 3]))

    tm = randomize(MnasNet(), seed=65).eval()
    wts = tmp_path / "mn.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("mnasnet", str(wts), alpha=0.5, num_classes=10,
                       input_h=96, input_w=96)
    x = rng.uniform(-1, 1, (1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
