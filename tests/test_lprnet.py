"""LPRNet parity vs a sirius-ai-layout torch reference."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize


class SmallBasicBlock(tnn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(ci, co // 4, 1), tnn.ReLU(),
            tnn.Conv2d(co // 4, co // 4, (3, 1), padding=(1, 0)), tnn.ReLU(),
            tnn.Conv2d(co // 4, co // 4, (1, 3), padding=(0, 1)), tnn.ReLU(),
            tnn.Conv2d(co // 4, co, 1))

    def forward(self, x):
        return self.block(x)


class TorchLPRNet(tnn.Module):
    def __init__(self, nc=68):
        super().__init__()
        self.backbone = tnn.Sequential(
            tnn.Conv2d(3, 64, 3), tnn.BatchNorm2d(64), tnn.ReLU(),       # 0-2
            tnn.MaxPool3d((1, 3, 3), (1, 1, 1)),                          # 3
            SmallBasicBlock(64, 128), tnn.BatchNorm2d(128), tnn.ReLU(),   # 4-6
            tnn.MaxPool3d((1, 3, 3), (2, 1, 2)),                          # 7
            SmallBasicBlock(64, 256), tnn.BatchNorm2d(256), tnn.ReLU(),   # 8-10
            SmallBasicBlock(256, 256), tnn.BatchNorm2d(256), tnn.ReLU(),  # 11-13
            tnn.MaxPool3d((1, 3, 3), (4, 1, 2)),                          # 14
            tnn.Dropout(0.5),                                             # 15
            tnn.Conv2d(64, 256, (1, 4)), tnn.BatchNorm2d(256), tnn.ReLU(),  # 16-18
            tnn.Dropout(0.5),                                             # 19
            tnn.Conv2d(256, nc, (13, 1)), tnn.BatchNorm2d(nc), tnn.ReLU())  # 20-22
        self.container = tnn.Sequential(tnn.Conv2d(64 + 128 + 256 + nc, nc, 1))

    def forward(self, x):
        keeps = []
        for i, layer in enumerate(self.backbone):
            # MaxPool3d on a 4D tensor: torch treats (B,C,H,W) as unbatched
            # (C,D,H,W), pooling (channels, H, W) — the sirius-ai trick.
            x = layer(x)
            if i in (2, 6, 13, 22):
                keeps.append(x)
        gcs = []
        for i, f in enumerate(keeps):
            if i in (0, 1):
                f = F.avg_pool2d(f, 5, 5)
            if i == 2:
                f = F.avg_pool2d(f, (4, 10), (4, 2))
            f_pow = torch.pow(f, 2)
            f_mean = torch.mean(f_pow)
            f = torch.div(f, f_mean)
            gcs.append(f)
        x = torch.cat(gcs, 1)
        x = self.container(x)
        return torch.mean(x, dim=2)


def test_lprnet_parity(tmp_path, rng):
    tm = randomize(TorchLPRNet(), seed=95).eval()
    wts = tmp_path / "lpr.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("lprnet", str(wts))
    x = rng.uniform(-1, 1, (1, 3, 24, 94)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()   # (1, 68, 18)
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    assert got.shape == ref.shape
    tol = max(2e-3, 1e-5 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
