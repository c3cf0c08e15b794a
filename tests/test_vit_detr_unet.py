"""ViT (vs HuggingFace transformers), DETR components, UNet parity."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize


def test_vit_parity_vs_transformers(tmp_path, rng):
    from transformers import ViTConfig, ViTForImageClassification

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                    intermediate_size=128, image_size=32, patch_size=8,
                    num_labels=7)
    torch.manual_seed(0)
    tm = ViTForImageClassification(cfg).eval()
    wts = tmp_path / "vit.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("vit", str(wts), hidden=64, heads=4, layers=2, mlp=128,
                       patch=8, num_classes=7, input_h=32, input_w=32)
    x = rng.uniform(-1, 1, (2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).logits.numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_detr_mha_matches_torch(rng):
    from tensorrtx_tpu.models.detr import _mha

    d, nh = 32, 4
    torch.manual_seed(1)
    mha = tnn.MultiheadAttention(d, nh, batch_first=True).eval()
    q = rng.normal(0, 1, (2, 5, d)).astype(np.float32)
    k = rng.normal(0, 1, (2, 9, d)).astype(np.float32)
    v = rng.normal(0, 1, (2, 9, d)).astype(np.float32)
    with torch.no_grad():
        ref, _ = mha(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v))
    ipw = mha.in_proj_weight.detach().numpy()
    ipb = mha.in_proj_bias.detach().numpy()
    ap = {
        "q": {"w": ipw[:d].T.copy(), "b": ipb[:d]},
        "k": {"w": ipw[d:2 * d].T.copy(), "b": ipb[d:2 * d]},
        "v": {"w": ipw[2 * d:].T.copy(), "b": ipb[2 * d:]},
        "out": {"w": mha.out_proj.weight.detach().numpy().T.copy(),
                "b": mha.out_proj.bias.detach().numpy()},
    }
    ap = jax.tree.map(jnp.asarray, ap)
    got = np.asarray(_mha(ap, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), nh))
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-5)


def test_detr_position_embedding_reference_formula():
    from tensorrtx_tpu.models.detr import position_embedding_sine

    h, w, npf = 3, 4, 8
    pos = position_embedding_sine(h, w, npf)
    # scalar re-derivation of detr.cpp:31-110
    eps, scale, temp = 1e-6, 2 * math.pi, 10000
    for i in range(h):
        for j in range(w):
            ye = (i + 1) / (h + eps) * scale
            xe = (j + 1) / (w + eps) * scale
            for k in range(npf):
                dt = temp ** (2 * (k // 2) / npf)
                vy, vx = ye / dt, xe / dt
                ey = math.cos(vy) if k % 2 else math.sin(vy)
                ex = math.cos(vx) if k % 2 else math.sin(vx)
                assert abs(pos[i * w + j, k] - ey) < 1e-5
                assert abs(pos[i * w + j, npf + k] - ex) < 1e-5


def test_detr_runs_and_outputs_sane(rng):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    import dataclasses

    model = get_model("detr")
    cfg = dataclasses.replace(model.default_cfg(), input_h=128, input_w=128,
                              enc_layers=2, dec_layers=2)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["scores"].shape == (1, 100, 92)
    assert out["boxes"].shape == (1, 100, 4)
    s = np.asarray(out["scores"])
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-4)
    bx = np.asarray(out["boxes"])
    assert (bx >= 0).all() and (bx <= 1).all()


class TorchDoubleConv(tnn.Module):
    def __init__(self, cin, cout, cmid=None):
        super().__init__()
        cmid = cmid or cout
        self.double_conv = tnn.Sequential(
            tnn.Conv2d(cin, cmid, 3, padding=1, bias=False), tnn.BatchNorm2d(cmid),
            tnn.ReLU(True),
            tnn.Conv2d(cmid, cout, 3, padding=1, bias=False), tnn.BatchNorm2d(cout),
            tnn.ReLU(True))

    def forward(self, x):
        return self.double_conv(x)


class TorchUNet(tnn.Module):
    def __init__(self, n_classes=2):
        super().__init__()

        class Down(tnn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.maxpool_conv = tnn.Sequential(
                    tnn.MaxPool2d(2),
                    tnn.Module())
                self.maxpool_conv[1] = TorchDoubleConv(cin, cout)

            def forward(self, x):
                return self.maxpool_conv(x)

        class Up(tnn.Module):
            def __init__(self, cin, cout, cmid):
                super().__init__()
                self.up = tnn.Upsample(scale_factor=2, mode="bilinear",
                                       align_corners=True)
                self.conv = TorchDoubleConv(cin, cout, cmid)

            def forward(self, x1, x2):
                return self.conv(torch.cat([x2, self.up(x1)], 1))

        class OutConv(tnn.Module):
            def __init__(self, cin, n):
                super().__init__()
                self.conv = tnn.Conv2d(cin, n, 1)

            def forward(self, x):
                return self.conv(x)

        self.inc = TorchDoubleConv(3, 64)
        self.down1 = Down(64, 128)
        self.down2 = Down(128, 256)
        self.down3 = Down(256, 512)
        self.down4 = Down(512, 512)
        self.up1 = Up(1024, 256, 512)
        self.up2 = Up(512, 128, 256)
        self.up3 = Up(256, 64, 128)
        self.up4 = Up(128, 64, 64)
        self.outc = OutConv(64, n_classes)

    def forward(self, x):
        x1 = self.inc(x)
        x2 = self.down1(x1)
        x3 = self.down2(x2)
        x4 = self.down3(x3)
        x5 = self.down4(x4)
        y = self.up1(x5, x4)
        y = self.up2(y, x3)
        y = self.up3(y, x2)
        y = self.up4(y, x1)
        return self.outc(y)


def test_unet_parity(tmp_path, rng):
    tm = randomize(TorchUNet(), seed=13).eval()
    wts = tmp_path / "unet.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("unet", str(wts), input_h=64, input_w=96)
    x = rng.uniform(-1, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, np.transpose(ref, (0, 2, 3, 1)), atol=tol)


def test_detr_s2d_input_format_matches_hwc(rng):
    """input_format='s2d2' (host-side pixel shuffle) must equal the hwc
    path exactly — same graph from the stem conv onward."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.ops import nn as jnn

    model = get_model("detr")
    base = dataclasses.replace(model.default_cfg(), input_h=64, input_w=64,
                               enc_layers=1, dec_layers=1)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(seed=4), base))
    x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 3)), jnp.float32)
    ref = model.apply(params, x, base)
    cfg2 = dataclasses.replace(base, input_format="s2d2")
    got = model.apply(params, jnn.space_to_depth2(x), cfg2)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-6)
