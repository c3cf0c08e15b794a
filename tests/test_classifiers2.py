"""GoogLeNet / DenseNet-121 / ShuffleNetV2 / Real-ESRGAN parity."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize


# --- googlenet ---------------------------------------------------------------

class BasicConv2d(tnn.Module):
    def __init__(self, ci, co, k, s=1, p=0):
        super().__init__()
        self.conv = tnn.Conv2d(ci, co, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(co, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)), inplace=True)


class Inception(tnn.Module):
    def __init__(self, ci, b1, b2r, b2, b3r, b3, b4):
        super().__init__()
        self.branch1 = BasicConv2d(ci, b1, 1)
        self.branch2 = tnn.Sequential(BasicConv2d(ci, b2r, 1),
                                      BasicConv2d(b2r, b2, 3, p=1))
        self.branch3 = tnn.Sequential(BasicConv2d(ci, b3r, 1),
                                      BasicConv2d(b3r, b3, 3, p=1))
        self.branch4 = tnn.Sequential(tnn.MaxPool2d(3, 1, 1, ceil_mode=True),
                                      BasicConv2d(ci, b4, 1))

    def forward(self, x):
        return torch.cat([self.branch1(x), self.branch2(x), self.branch3(x),
                          self.branch4(x)], 1)


class TorchGoogLeNet(tnn.Module):
    def __init__(self, nc=1000):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, 7, 2, 3)
        self.maxpool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, 1)
        self.conv3 = BasicConv2d(64, 192, 3, p=1)
        self.maxpool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
        self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
        self.maxpool3 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
        self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
        self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
        self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
        self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
        self.maxpool4 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
        self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)
        self.fc = tnn.Linear(1024, nc)

    def forward(self, x):
        y = self.maxpool1(self.conv1(x))
        y = self.maxpool2(self.conv3(self.conv2(y)))
        y = self.maxpool3(self.inception3b(self.inception3a(y)))
        y = self.inception4e(self.inception4d(self.inception4c(
            self.inception4b(self.inception4a(y)))))
        y = self.maxpool4(y)
        y = self.inception5b(self.inception5a(y))
        y = F.adaptive_avg_pool2d(y, 1).flatten(1)
        return self.fc(y)


def test_googlenet(tmp_path, rng):
    tm = randomize(TorchGoogLeNet(10), seed=31).eval()
    wts = tmp_path / "g.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("googlenet", str(wts), num_classes=10)
    x = rng.uniform(-1, 1, (1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


# --- densenet ----------------------------------------------------------------

def test_densenet121(tmp_path, rng):
    import collections

    class DenseLayer(tnn.Module):
        def __init__(self, cin, growth=32):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(cin)
            self.conv1 = tnn.Conv2d(cin, 4 * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(4 * growth)
            self.conv2 = tnn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            y = self.conv1(F.relu(self.norm1(x)))
            return self.conv2(F.relu(self.norm2(y)))

    class TorchDenseNet(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            feats = collections.OrderedDict()
            feats["conv0"] = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            feats["norm0"] = tnn.BatchNorm2d(64)
            ch = 64
            for bi, n in enumerate((6, 12, 24, 16)):
                block = tnn.Module()
                for li in range(n):
                    block.add_module(f"denselayer{li + 1}", DenseLayer(ch + li * 32))
                feats[f"denseblock{bi + 1}"] = block
                ch += n * 32
                if bi < 3:
                    tr = tnn.Module()
                    tr.norm = tnn.BatchNorm2d(ch)
                    tr.conv = tnn.Conv2d(ch, ch // 2, 1, bias=False)
                    feats[f"transition{bi + 1}"] = tr
                    ch //= 2
            feats["norm5"] = tnn.BatchNorm2d(ch)
            self.features = tnn.ModuleDict(feats)
            self.classifier = tnn.Linear(ch, nc)

        def forward(self, x):
            f = self.features
            y = F.max_pool2d(F.relu(f["norm0"](f["conv0"](x))), 3, 2, 1)
            for bi in range(4):
                block = f[f"denseblock{bi + 1}"]
                feats_list = y
                for li, (name, layer) in enumerate(block.named_children()):
                    z = layer(feats_list)
                    feats_list = torch.cat([feats_list, z], 1)
                y = feats_list
                if bi < 3:
                    tr = f[f"transition{bi + 1}"]
                    y = F.avg_pool2d(tr.conv(F.relu(tr.norm(y))), 2, 2)
            y = F.relu(f["norm5"](y))
            return self.classifier(F.adaptive_avg_pool2d(y, 1).flatten(1))

    tm = randomize(TorchDenseNet(), seed=33).eval()
    wts = tmp_path / "d.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("densenet", str(wts), num_classes=10, input_h=64, input_w=64)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


# --- shufflenetv2 ------------------------------------------------------------

def test_shufflenetv2(tmp_path, rng):
    def shuffle(x, g=2):
        b, c, h, w = x.size()
        return x.view(b, g, c // g, h, w).transpose(1, 2).reshape(b, c, h, w)

    class InvRes(tnn.Module):
        def __init__(self, ci, co, stride):
            super().__init__()
            half = co // 2
            self.stride = stride
            if stride > 1:
                self.branch1 = tnn.Sequential(
                    tnn.Conv2d(ci, ci, 3, stride, 1, groups=ci, bias=False),
                    tnn.BatchNorm2d(ci),
                    tnn.Conv2d(ci, half, 1, bias=False), tnn.BatchNorm2d(half),
                    tnn.ReLU(True))
            b2in = ci if stride > 1 else half
            self.branch2 = tnn.Sequential(
                tnn.Conv2d(b2in, half, 1, bias=False), tnn.BatchNorm2d(half),
                tnn.ReLU(True),
                tnn.Conv2d(half, half, 3, stride, 1, groups=half, bias=False),
                tnn.BatchNorm2d(half),
                tnn.Conv2d(half, half, 1, bias=False), tnn.BatchNorm2d(half),
                tnn.ReLU(True))

        def forward(self, x):
            if self.stride == 1:
                a, b = x.chunk(2, 1)
                out = torch.cat([a, self.branch2(b)], 1)
            else:
                out = torch.cat([self.branch1(x), self.branch2(x)], 1)
            return shuffle(out)

    class TorchShuffleNet(tnn.Module):
        def __init__(self, nc=10):
            super().__init__()
            chans = [24, 116, 232, 464, 1024]
            self.conv1 = tnn.Sequential(tnn.Conv2d(3, 24, 3, 2, 1, bias=False),
                                        tnn.BatchNorm2d(24), tnn.ReLU(True))
            cin = 24
            for si, n in enumerate([4, 8, 4]):
                co = chans[si + 1]
                layers = [InvRes(cin, co, 2)]
                layers += [InvRes(co, co, 1) for _ in range(n - 1)]
                setattr(self, f"stage{si + 2}", tnn.Sequential(*layers))
                cin = co
            self.conv5 = tnn.Sequential(tnn.Conv2d(cin, 1024, 1, bias=False),
                                        tnn.BatchNorm2d(1024), tnn.ReLU(True))
            self.fc = tnn.Linear(1024, nc)

        def forward(self, x):
            y = F.max_pool2d(self.conv1(x), 3, 2, 1)
            y = self.stage4(self.stage3(self.stage2(y)))
            y = self.conv5(y).mean([2, 3])
            return self.fc(y)

    tm = randomize(TorchShuffleNet(), seed=35).eval()
    wts = tmp_path / "s.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("shufflenetv2", str(wts), variant="x1_0", num_classes=10,
                       input_h=96, input_w=96)
    x = rng.uniform(-1, 1, (1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


# --- real-esrgan -------------------------------------------------------------

def test_real_esrgan_small(tmp_path, rng):
    class RDB(tnn.Module):
        def __init__(self, nf=16, gc=8):
            super().__init__()
            self.conv1 = tnn.Conv2d(nf, gc, 3, 1, 1)
            self.conv2 = tnn.Conv2d(nf + gc, gc, 3, 1, 1)
            self.conv3 = tnn.Conv2d(nf + 2 * gc, gc, 3, 1, 1)
            self.conv4 = tnn.Conv2d(nf + 3 * gc, gc, 3, 1, 1)
            self.conv5 = tnn.Conv2d(nf + 4 * gc, nf, 3, 1, 1)

        def forward(self, x):
            l = lambda v: F.leaky_relu(v, 0.2)
            x1 = l(self.conv1(x))
            x2 = l(self.conv2(torch.cat((x, x1), 1)))
            x3 = l(self.conv3(torch.cat((x, x1, x2), 1)))
            x4 = l(self.conv4(torch.cat((x, x1, x2, x3), 1)))
            x5 = self.conv5(torch.cat((x, x1, x2, x3, x4), 1))
            return x5 * 0.2 + x

    class RRDB(tnn.Module):
        def __init__(self, nf, gc):
            super().__init__()
            self.rdb1, self.rdb2, self.rdb3 = RDB(nf, gc), RDB(nf, gc), RDB(nf, gc)

        def forward(self, x):
            return self.rdb3(self.rdb2(self.rdb1(x))) * 0.2 + x

    class RRDBNet(tnn.Module):
        def __init__(self, nf=16, gc=8, nb=2):
            super().__init__()
            self.conv_first = tnn.Conv2d(3, nf, 3, 1, 1)
            self.body = tnn.Sequential(*[RRDB(nf, gc) for _ in range(nb)])
            self.conv_body = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up1 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_up2 = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_hr = tnn.Conv2d(nf, nf, 3, 1, 1)
            self.conv_last = tnn.Conv2d(nf, 3, 3, 1, 1)

        def forward(self, x):
            l = lambda v: F.leaky_relu(v, 0.2)
            feat = self.conv_first(x)
            y = feat + self.conv_body(self.body(feat))
            y = l(self.conv_up1(F.interpolate(y, scale_factor=2, mode="nearest")))
            y = l(self.conv_up2(F.interpolate(y, scale_factor=2, mode="nearest")))
            return self.conv_last(l(self.conv_hr(y)))

    tm = randomize(RRDBNet(), seed=37).eval()
    wts = tmp_path / "sr.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("real-esrgan", str(wts), num_feat=16, num_grow=8,
                       num_blocks=2, input_h=24, input_w=32)
    x = rng.uniform(0, 1, (1, 3, 24, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    assert got.shape == (1, 96, 128, 3)
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=2e-4)
