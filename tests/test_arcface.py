"""ArcFace r50 parity: synthesized MXNet-named weights → .wts → engine, vs a
torch functional reference of the LResNet-IR graph."""

import numpy as np
import torch
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import save_wts
from tensorrtx_tpu.models.arcface import UNITS, cosine_similarity

EPS = 2e-5


def make_weights(rng):
    w = {}

    def conv(name, co, ci, k):
        std = (ci * k * k) ** -0.5  # fan-in scaling keeps activations bounded
        w[f"{name}_weight"] = rng.normal(0, std, (co, ci, k, k)).astype(np.float32)

    def bn(name, ch):
        w[f"{name}_gamma"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
        w[f"{name}_beta"] = rng.normal(0, 0.1, ch).astype(np.float32)
        w[f"{name}_moving_mean"] = rng.normal(0, 0.1, ch).astype(np.float32)
        w[f"{name}_moving_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    conv("conv0", 64, 3, 3)
    bn("bn0", 64)
    w["relu0_gamma"] = rng.uniform(0.1, 0.3, 64).astype(np.float32)
    cin = 64
    for si, n in enumerate(UNITS["r50"]):
        f = 64 * (2 ** si)
        for ui in range(1, n + 1):
            name = f"stage{si + 1}_unit{ui}"
            bn(f"{name}_bn1", cin)
            conv(f"{name}_conv1", f, cin, 3)
            bn(f"{name}_bn2", f)
            w[f"{name}_relu1_gamma"] = rng.uniform(0.1, 0.3, f).astype(np.float32)
            conv(f"{name}_conv2", f, f, 3)
            bn(f"{name}_bn3", f)
            if ui == 1:
                conv(f"{name}_conv1sc", f, cin, 1)
                bn(f"{name}_sc", f)
            cin = f
    bn("bn1", 512)
    w["pre_fc1_weight"] = rng.normal(0, (512 * 49) ** -0.5,
                                     (512, 512 * 7 * 7)).astype(np.float32)
    w["pre_fc1_bias"] = rng.normal(0, 0.05, 512).astype(np.float32)
    bn("fc1", 512)
    return w


def torch_forward(w, x):
    def bnf(t, name):
        g, b = w[f"{name}_gamma"], w[f"{name}_beta"]
        m, v = w[f"{name}_moving_mean"], w[f"{name}_moving_var"]
        s = g / np.sqrt(v + EPS)
        sh = b - m * s
        shape = (1, -1, 1, 1) if t.dim() == 4 else (1, -1)
        return t * torch.from_numpy(s).view(shape) + torch.from_numpy(sh).view(shape)

    def convf(t, name, stride=1, pad=0):
        return F.conv2d(t, torch.from_numpy(w[f"{name}_weight"]), stride=stride,
                        padding=pad)

    def preluf(t, name):
        return F.prelu(t, torch.from_numpy(w[f"{name}_gamma"]))

    y = preluf(bnf(convf(x, "conv0", pad=1), "bn0"), "relu0")
    for si, n in enumerate(UNITS["r50"]):
        for ui in range(1, n + 1):
            name = f"stage{si + 1}_unit{ui}"
            s = 2 if ui == 1 else 1
            z = bnf(y, f"{name}_bn1")
            z = convf(z, f"{name}_conv1", pad=1)
            z = preluf(bnf(z, f"{name}_bn2"), f"{name}_relu1")
            z = convf(z, f"{name}_conv2", stride=s, pad=1)
            z = bnf(z, f"{name}_bn3")
            sc = bnf(convf(y, f"{name}_conv1sc", stride=s), f"{name}_sc") if ui == 1 else y
            y = z + sc
    y = bnf(y, "bn1")
    y = y.flatten(1)
    y = y @ torch.from_numpy(w["pre_fc1_weight"]).T + torch.from_numpy(w["pre_fc1_bias"])
    return bnf(y, "fc1")


def test_arcface_r50_parity(tmp_path, rng):
    w = make_weights(rng)
    wts = tmp_path / "arcface.wts"
    save_wts(str(wts), w)
    eng = build_engine("arcface", str(wts), variant="r50")
    x = rng.uniform(-1, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        ref = torch_forward(w, torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
    # two-image cosine-similarity driver (arcface-r50.cpp:387-409)
    sim_self = cosine_similarity(got[0], got[0])
    sim_cross = cosine_similarity(got[0], got[1])
    assert abs(sim_self - 1.0) < 1e-5
    ref_cross = cosine_similarity(ref[0], ref[1])
    assert abs(sim_cross - ref_cross) < 1e-3
