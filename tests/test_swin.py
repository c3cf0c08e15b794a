"""Swin-T seg: shifted-window block torch parity + full-graph smoke.

The torch reference re-derives the official Swin block math (window
partition, relative position bias, SW-MSA mask, roll) functionally."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model

WIN, SHIFT = 7, 3


def _torch_block(x, p, nh, shift):
    # x: (1, H, W, C)
    _, h, w, c = x.shape
    res = x
    y = F.layer_norm(x, (c,), p["n1g"], p["n1b"])
    hp = -(-h // WIN) * WIN
    wp = -(-w // WIN) * WIN
    y = F.pad(y, (0, 0, 0, wp - w, 0, hp - h))
    if shift:
        y = torch.roll(y, (-SHIFT, -SHIFT), dims=(1, 2))
    yw = y.view(1, hp // WIN, WIN, wp // WIN, WIN, c).permute(0, 1, 3, 2, 4, 5)
    yw = yw.reshape(-1, WIN * WIN, c)
    qkv = (yw @ p["qkv_w"].T + p["qkv_b"]).reshape(-1, 49, 3, nh, c // nh)
    q, k, v = [qkv[:, :, i].transpose(1, 2) for i in range(3)]
    attn = q @ k.transpose(-1, -2) / np.sqrt(c // nh)
    bias = p["tab"][p["idx"].long()].view(49, 49, nh).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    if shift:
        img = torch.zeros(hp, wp, dtype=torch.long)
        cnt = 0
        for hs in (slice(0, -WIN), slice(-WIN, -SHIFT), slice(-SHIFT, None)):
            for ws in (slice(0, -WIN), slice(-WIN, -SHIFT), slice(-SHIFT, None)):
                img[hs, ws] = cnt
                cnt += 1
        wm = img.view(hp // WIN, WIN, wp // WIN, WIN).permute(0, 2, 1, 3)
        wm = wm.reshape(-1, 49)
        m = (wm.unsqueeze(1) - wm.unsqueeze(2)) != 0
        attn = attn + torch.where(m, -100.0, 0.0).unsqueeze(1)
    attn = torch.softmax(attn, -1)
    out = (attn @ v).transpose(1, 2).reshape(-1, 49, c)
    out = out @ p["proj_w"].T + p["proj_b"]
    y = out.view(1, hp // WIN, wp // WIN, WIN, WIN, c).permute(0, 1, 3, 2, 4, 5)
    y = y.reshape(1, hp, wp, c)
    if shift:
        y = torch.roll(y, (SHIFT, SHIFT), dims=(1, 2))
    x = res + y[:, :h, :w]
    z = F.layer_norm(x, (c,), p["n2g"], p["n2b"])
    z = F.gelu(z @ p["fc1_w"].T + p["fc1_b"]) @ p["fc2_w"].T + p["fc2_b"]
    return x + z


def test_swin_block_matches_torch(rng):
    from tensorrtx_tpu.models.swin import _block_a, _block_p, _sw_mask

    c, nh, h = 32, 2, 11   # non-multiple of 7 exercises pad+crop
    raw = {
        "b.norm1.weight": rng.normal(1, .1, c), "b.norm1.bias": rng.normal(0, .1, c),
        "b.attn.qkv.weight": rng.normal(0, .1, (3 * c, c)),
        "b.attn.qkv.bias": rng.normal(0, .1, 3 * c),
        "b.attn.proj.weight": rng.normal(0, .1, (c, c)),
        "b.attn.proj.bias": rng.normal(0, .1, c),
        "b.attn.relative_position_bias_table": rng.normal(0, .1, (169, nh)),
        "b.norm2.weight": rng.normal(1, .1, c), "b.norm2.bias": rng.normal(0, .1, c),
        "b.mlp.fc1.weight": rng.normal(0, .1, (4 * c, c)),
        "b.mlp.fc1.bias": rng.normal(0, .1, 4 * c),
        "b.mlp.fc2.weight": rng.normal(0, .1, (c, 4 * c)),
        "b.mlp.fc2.bias": rng.normal(0, .1, c),
    }
    # torch Swin relative_position_index, exported as float in .wts
    coords = np.stack(np.meshgrid(np.arange(WIN), np.arange(WIN), indexing="ij"))
    cf = coords.reshape(2, -1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.transpose(1, 2, 0) + WIN - 1
    idx = (rel[..., 0] * (2 * WIN - 1) + rel[..., 1]).reshape(-1)
    raw["b.attn.relative_position_index"] = idx.astype(np.float32)
    from tensorrtx_tpu.core.params import WeightMap

    wm = WeightMap({k: np.asarray(v, np.float32).ravel() for k, v in raw.items()})
    x = rng.normal(0, 1, (1, h, h, c)).astype(np.float32)
    tp = {"n1g": torch.from_numpy(raw["b.norm1.weight"].astype(np.float32)),
          "n1b": torch.from_numpy(raw["b.norm1.bias"].astype(np.float32)),
          "qkv_w": torch.from_numpy(raw["b.attn.qkv.weight"].astype(np.float32)),
          "qkv_b": torch.from_numpy(raw["b.attn.qkv.bias"].astype(np.float32)),
          "proj_w": torch.from_numpy(raw["b.attn.proj.weight"].astype(np.float32)),
          "proj_b": torch.from_numpy(raw["b.attn.proj.bias"].astype(np.float32)),
          "tab": torch.from_numpy(raw["b.attn.relative_position_bias_table"].astype(np.float32)),
          "idx": torch.from_numpy(idx.astype(np.int64)),
          "n2g": torch.from_numpy(raw["b.norm2.weight"].astype(np.float32)),
          "n2b": torch.from_numpy(raw["b.norm2.bias"].astype(np.float32)),
          "fc1_w": torch.from_numpy(raw["b.mlp.fc1.weight"].astype(np.float32)),
          "fc1_b": torch.from_numpy(raw["b.mlp.fc1.bias"].astype(np.float32)),
          "fc2_w": torch.from_numpy(raw["b.mlp.fc2.weight"].astype(np.float32)),
          "fc2_b": torch.from_numpy(raw["b.mlp.fc2.bias"].astype(np.float32))}

    for shift in (False, True):
        bp = _block_p(wm, "b", c, nh)
        if shift:
            hp = -(-h // WIN) * WIN
            bp["mask"] = jnp.asarray(_sw_mask(hp, hp))
        bp = jax.tree.map(jnp.asarray, bp)
        got = np.asarray(_block_a(bp, jnp.asarray(x), nh, shift))
        exp = _torch_block(torch.from_numpy(x), tp, nh, shift).numpy()
        np.testing.assert_allclose(got, exp, atol=3e-5,
                                   err_msg=f"shift={shift}")


def test_swin_seg_full_graph(rng):
    model = get_model("swin")
    # H/32 must divide the PSP grids (1,2,3,6) like the reference's 576
    cfg = dataclasses.replace(model.default_cfg(), input_h=192, input_w=192,
                              num_classes=5)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 192, 192, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 192, 192)
    o = np.asarray(out)
    assert o.dtype == np.int32 and o.min() >= 0 and o.max() < 5
