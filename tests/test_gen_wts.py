"""gen_wts exporter: user checkpoints → .wts (reference: per-model
gen_wts.py scripts, e.g. yolo11/gen_wts.py ckpt['model'].float().state_dict())."""

import numpy as np
import pytest
import torch
import torch.nn as nn

from tensorrtx_tpu.core.wts import load_wts
from tensorrtx_tpu.tools.gen_wts import convert, extract_tensors


class Tiny(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = nn.Conv2d(3, 8, 3)
        self.bn = nn.BatchNorm2d(8)
        self.fc = nn.Linear(8, 4)


def test_plain_state_dict_roundtrip(tmp_path):
    m = Tiny()
    pt = tmp_path / "m.pth"
    torch.save(m.state_dict(), pt)
    out = tmp_path / "m.wts"
    n = convert(str(pt), str(out))
    wm = load_wts(str(out))
    assert n == len(wm)
    np.testing.assert_allclose(
        wm["conv.weight"].reshape(8, 3, 3, 3),
        m.state_dict()["conv.weight"].numpy(), rtol=1e-6)
    assert "bn.running_mean" in wm


def test_ultralytics_style_bundle(tmp_path):
    m = Tiny().half()
    pt = tmp_path / "yolo.pt"
    torch.save({"model": m, "epoch": 3}, pt)
    out = tmp_path / "yolo.wts"
    convert(str(pt), str(out))
    wm = load_wts(str(out))
    # fp16 ckpt must be exported as fp32 (gen_wts.py .float())
    assert wm["fc.weight"].dtype == np.float32
    np.testing.assert_allclose(
        wm["fc.weight"].reshape(4, 8),
        m.float().state_dict()["fc.weight"].detach().numpy(), rtol=1e-3)


def test_state_dict_wrapper_and_filters(tmp_path):
    m = Tiny()
    sd = {"module." + k: v for k, v in m.state_dict().items()}
    pt = tmp_path / "w.pth"
    torch.save({"state_dict": sd}, pt)
    out = tmp_path / "w.wts"
    convert(str(pt), str(out), exclude=r"num_batches_tracked",
            strip_prefix="module.")
    wm = load_wts(str(out))
    assert "conv.weight" in wm
    assert not any("num_batches_tracked" in k for k in wm)
    assert not any(k.startswith("module.") for k in wm)


def test_npz_input(tmp_path):
    rng = np.random.default_rng(0)
    arrs = {"a.w": rng.normal(size=(4, 4)).astype(np.float32),
            "b.b": rng.normal(size=(7,)).astype(np.float32)}
    npz = tmp_path / "p.npz"
    np.savez(npz, **arrs)
    out = tmp_path / "p.wts"
    convert(str(npz), str(out))
    wm = load_wts(str(out))
    np.testing.assert_allclose(wm["a.w"].reshape(4, 4), arrs["a.w"], rtol=1e-6)


def test_cli_gen_wts(tmp_path):
    from tensorrtx_tpu.cli import main

    m = Tiny()
    pt = tmp_path / "m.pth"
    torch.save(m.state_dict(), pt)
    out = tmp_path / "m.wts"
    assert main(["gen-wts", "-w", str(pt), "-o", str(out)]) == 0
    assert out.exists()
