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


def _write_pdiparams(path, tensors):
    """Serialize tensors in paddle's combined LoDTensor stream format
    (see tools/paddle_reader.py module docstring for the field layout)."""
    import struct

    def varint(v):
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    dtid = {np.dtype(np.float32): 5, np.dtype(np.float64): 6,
            np.dtype(np.int64): 3, np.dtype(np.float16): 4}
    with open(path, "wb") as f:
        for arr in tensors:
            f.write(struct.pack("<I", 0))          # lod version
            f.write(struct.pack("<Q", 0))          # lod levels
            f.write(struct.pack("<I", 0))          # tensor version
            desc = varint((1 << 3) | 0) + varint(dtid[arr.dtype])
            for d in arr.shape:
                desc += varint((2 << 3) | 0) + varint(d)
            f.write(struct.pack("<i", len(desc)))
            f.write(desc)
            f.write(arr.tobytes())


@pytest.mark.fast
def test_gen_wts_paddle_dir(tmp_path, rng):
    """Paddle PIR inference dir → .wts without the paddle wheel.

    Reference analog: ppocrv5/gen_wts.py loads the dir via paddle and dumps
    params; here the .pdiparams stream and the program JSON are parsed
    directly (combined save writes tensors sorted by name)."""
    import json as _json

    from tensorrtx_tpu.core.wts import load_wts

    names = ["conv2d_0.w_0", "batch_norm_0.b_0", "linear_5.w_0",
             "linear_5.b_0"]
    tensors = {
        "conv2d_0.w_0": rng.normal(0, 1, (8, 3, 3, 3)).astype(np.float32),
        "batch_norm_0.b_0": rng.normal(0, 1, (8,)).astype(np.float32),
        "linear_5.w_0": rng.normal(0, 1, (16, 10)).astype(np.float32),
        "linear_5.b_0": rng.normal(0, 1, (10,)).astype(np.float64),
    }
    d = tmp_path / "PP-Test_mobile_det"
    d.mkdir()
    _write_pdiparams(d / "inference.pdiparams",
                     [tensors[n] for n in sorted(names)])
    program = {"program": {"regions": [{"blocks": [{"ops": [
        {"name": "builtin.parameter",
         "attrs": {"parameter_name": n}} for n in names]}]}]}}
    (d / "inference.json").write_text(_json.dumps(program))

    out = tmp_path / "ppocr.wts"
    n = convert(str(d), str(out))
    assert n == 4
    wm = load_wts(str(out))
    for name, ref in tensors.items():
        np.testing.assert_allclose(
            wm[name].reshape(ref.shape), ref.astype(np.float32), rtol=1e-6)

    # legacy .pdmodel program path: names recovered by convention scan
    (d / "inference.json").unlink()
    blob = b"\x0a\x07junk" + b"".join(
        bytes([len(n)]) + n.encode() + b"\x12\x03aaa" for n in names)
    (d / "inference.pdmodel").write_bytes(blob)
    n = convert(str(d), str(out))
    assert n == 4
