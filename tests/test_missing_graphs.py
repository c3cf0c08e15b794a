"""Round-2 graph additions: convnextv2 (torch block parity), centernet
(DLA34 + DCNv2 + decode), Mask R-CNN mask head, HRNet-OCR."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_convnextv2_block_matches_torch(rng):
    from tensorrtx_tpu.models.convnextv2 import _block_a, _block_p

    dim = 8
    raw = {
        "b.dwconv.weight": rng.normal(0, 0.1, (dim, 1, 7, 7)).astype(
            np.float32).ravel(),
        "b.dwconv.bias": rng.normal(0, 0.1, dim).astype(np.float32),
        "b.norm.weight": rng.uniform(0.8, 1.2, dim).astype(np.float32),
        "b.norm.bias": rng.normal(0, 0.1, dim).astype(np.float32),
        "b.pwconv1.weight": rng.normal(0, 0.1, (4 * dim, dim)).astype(
            np.float32).ravel(),
        "b.pwconv1.bias": rng.normal(0, 0.1, 4 * dim).astype(np.float32),
        "b.grn.gamma": rng.normal(0, 0.1, 4 * dim).astype(np.float32),
        "b.grn.beta": rng.normal(0, 0.1, 4 * dim).astype(np.float32),
        "b.pwconv2.weight": rng.normal(0, 0.1, (dim, 4 * dim)).astype(
            np.float32).ravel(),
        "b.pwconv2.bias": rng.normal(0, 0.1, dim).astype(np.float32),
    }
    bp = jax.tree.map(jnp.asarray, _block_p(WeightMap(raw), "b", dim))
    x = rng.normal(0, 1, (1, dim, 9, 9)).astype(np.float32)
    got = np.asarray(_block_a(bp, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))

    with torch.no_grad():
        t = torch.from_numpy(x)
        y = F.conv2d(t, torch.from_numpy(
            raw["b.dwconv.weight"].reshape(dim, 1, 7, 7)),
            torch.from_numpy(raw["b.dwconv.bias"]), padding=3, groups=dim)
        y = y.permute(0, 2, 3, 1)  # NHWC
        y = F.layer_norm(y, (dim,), torch.from_numpy(raw["b.norm.weight"]),
                         torch.from_numpy(raw["b.norm.bias"]), eps=1e-6)
        y = y @ torch.from_numpy(
            raw["b.pwconv1.weight"].reshape(4 * dim, dim)).T + \
            torch.from_numpy(raw["b.pwconv1.bias"])
        y = F.gelu(y)
        gx = torch.norm(y, p=2, dim=(1, 2), keepdim=True)
        nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
        y = torch.from_numpy(raw["b.grn.gamma"]) * (y * nx) + \
            torch.from_numpy(raw["b.grn.beta"]) + y
        y = y @ torch.from_numpy(
            raw["b.pwconv2.weight"].reshape(dim, 4 * dim)).T + \
            torch.from_numpy(raw["b.pwconv2.bias"])
        exp = (t.permute(0, 2, 3, 1) + y).numpy()
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_convnextv2_full_graph(rng):
    m = get_model("convnextv2")
    cfg = m.default_cfg()
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x)
    assert out.shape == (1, 1000)
    assert np.isfinite(np.asarray(out)).all()


def test_centernet_full_graph_and_decode(rng):
    m = get_model("centernet")
    cfg = dataclasses.replace(m.default_cfg(), input_h=256, input_w=256)
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x)
    assert out["hm"].shape == (1, 64, 64, 80)
    assert out["boxes"].shape == (1, cfg.max_det, 4)
    # top-k scores are the nms'd heatmap peaks, sorted descending
    s = np.asarray(out["scores"])[0]
    assert (np.diff(s) <= 1e-6).all()
    hm = np.asarray(out["hm"])[0]
    assert s[0] <= hm.max() + 1e-6


def test_grouped_deconv_matches_torch(rng):
    from tensorrtx_tpu.ops import nn

    ch, f = 6, 2
    x = rng.normal(0, 1, (1, ch, 5, 5)).astype(np.float32)
    w = rng.normal(0, 1, (ch, 1, 2 * f, 2 * f)).astype(np.float32)
    with torch.no_grad():
        exp = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                 stride=f, padding=f // 2, groups=ch).numpy()
    got = np.asarray(nn.conv_transpose2d(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(w, (2, 3, 1, 0))), stride=f,
        padding=f // 2, groups=ch))
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)),
                               atol=1e-5)


def test_mask_rcnn_mask_head(rng):
    m = get_model("rcnn")
    cfg = dataclasses.replace(m.default_cfg(), task="mask", input_h=224,
                              input_w=320, pre_nms_topk=500,
                              post_nms_topk=100, detections_per_image=10)
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 224, 320, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x)
    assert out["masks"].shape == (1, 10, 14, 14)
    mk = np.asarray(out["masks"])
    assert (mk >= 0).all() and (mk <= 1).all()  # sigmoid probabilities


def test_hrnet_ocr_full_graph(rng):
    m = get_model("hrnet-ocr")
    cfg = dataclasses.replace(m.default_cfg(), input_h=128, input_w=256)
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 128, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x)
    assert out.shape == (1, 128, 256) and out.dtype == np.int32
    assert int(np.asarray(out).max()) < cfg.num_classes
