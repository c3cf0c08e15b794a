"""Swin-Transformer (tiny) + UPerNet semantic segmentation.

Reference: swin-transformer/semantic-segmentation/trainsform.cpp:27-130
(createEngine: 576x576, 15 classes, embed 96, depths 2/2/6/2, heads
3/6/12/24, window 7, shift 3) and common.hpp (blk :725, window attention
:570-682 with relative-position-bias gather, SW-MSA mask :301 — the
fillmask plugin's −100 additive mask, PatchMerging :773, UPerNet decode
head :860-890: lateral ConvModules, PSP 1/2/3/6 pooling, FPN fuse,
bilinear resizes via UpsamplePlugin, final argmax via addTopK).

TPU notes: windows are static reshapes (B, H/7, 7, W/7, 7, C) → one
batched einsum attention per stage instead of the reference's per-window
shuffle/slice chains; the SW-MSA mask is a compile-time numpy constant;
mmseg weight naming (backbone.layers.N.blocks.M.*, decode_head.*).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

DEPTHS = (2, 2, 6, 2)
HEADS = (3, 6, 12, 24)
WIN = 7
SHIFT = 3


@dataclasses.dataclass
class SwinSegCfg:
    num_classes: int = 15
    input_h: int = 576
    input_w: int = 576
    embed: int = 96
    fpn_ch: int = 512


def _ln_p(wm, name, ch):
    return {"g": wm.vec(f"{name}.weight", ch), "b": wm.vec(f"{name}.bias", ch)}


def _lin_p(wm, name, ci, co, bias=True):
    return wm.linear(name, co, ci, bias=bias)


def _convmodule_p(wm, name, ci, co, k):
    """mmseg ConvModule: conv (no bias) + BN + ReLU."""
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (k, k), eps=1e-5)


def _block_p(wm, name, dim, nh):
    return {
        "norm1": _ln_p(wm, f"{name}.norm1", dim),
        "qkv": _lin_p(wm, f"{name}.attn.qkv", dim, 3 * dim),
        "proj": _lin_p(wm, f"{name}.attn.proj", dim, dim),
        "bias_tab": wm.tensor(f"{name}.attn.relative_position_bias_table",
                              ((2 * WIN - 1) ** 2, nh)),
        "bias_idx": wm.tensor(f"{name}.attn.relative_position_index",
                              (WIN * WIN * WIN * WIN,)),
        "norm2": _ln_p(wm, f"{name}.norm2", dim),
        "fc1": _lin_p(wm, f"{name}.mlp.fc1", dim, 4 * dim),
        "fc2": _lin_p(wm, f"{name}.mlp.fc2", 4 * dim, dim),
    }


def build_params(wm, cfg: SwinSegCfg):
    c = cfg.embed
    p = {
        "patch_w": np.transpose(
            wm.tensor("backbone.patch_embed.proj.weight", (c, 3, 4, 4)),
            (2, 3, 1, 0)),
        "patch_b": wm.vec("backbone.patch_embed.proj.bias", c),
        "patch_ln": _ln_p(wm, "backbone.patch_embed.norm", c),
        "layers": [],
    }
    for li, (depth, nh) in enumerate(zip(DEPTHS, HEADS)):
        dim = c * (2 ** li)
        layer = {"blocks": [_block_p(wm, f"backbone.layers.{li}.blocks.{bi}",
                                     dim, nh) for bi in range(depth)]}
        if li < 3:
            layer["down_norm"] = _ln_p(wm, f"backbone.layers.{li}.downsample.norm",
                                       4 * dim)
            layer["down_red"] = _lin_p(wm, f"backbone.layers.{li}.downsample.reduction",
                                       4 * dim, 2 * dim, bias=False)
        p["layers"].append(layer)
    for i in range(4):
        p[f"out_norm{i}"] = _ln_p(wm, f"backbone.norm{i}", c * (2 ** i))
    f = cfg.fpn_ch
    p["lateral"] = [_convmodule_p(wm, f"decode_head.lateral_convs.{i}",
                                  c * (2 ** i), f, 1) for i in range(3)]
    p["psp"] = [_convmodule_p(wm, f"decode_head.psp_modules.{i}.1", 8 * c, f, 1)
                for i in range(4)]
    p["bottleneck"] = _convmodule_p(wm, "decode_head.bottleneck",
                                    8 * c + 4 * f, f, 3)
    p["fpn"] = [_convmodule_p(wm, f"decode_head.fpn_convs.{i}", f, f, 3)
                for i in range(3)]
    p["fpn_bottleneck"] = _convmodule_p(wm, "decode_head.fpn_bottleneck",
                                        4 * f, f, 3)
    p["seg_w"] = np.transpose(
        wm.tensor("decode_head.conv_seg.weight", (cfg.num_classes, f, 1, 1)),
        (2, 3, 1, 0))
    p["seg_b"] = wm.vec("decode_head.conv_seg.bias", cfg.num_classes)
    return p


def _ln(lp, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * lp["g"].astype(x.dtype) \
        + lp["b"].astype(x.dtype)


def _lin(lp, x):
    y = x @ lp["w"].astype(x.dtype)
    return y if lp["b"] is None else y + lp["b"].astype(x.dtype)


def _sw_mask(hp: int, wp: int) -> np.ndarray:
    """SW-MSA additive mask, (num_windows, 1, 49, 49) with 0 / −100
    (common.hpp:301-360 region table + fillmask.cu)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -WIN), slice(-WIN, -SHIFT), slice(-SHIFT, None)):
        for ws in (slice(0, -WIN), slice(-WIN, -SHIFT), slice(-SHIFT, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(hp // WIN, WIN, wp // WIN, WIN).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, WIN * WIN)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0)[:, None].astype(np.float32)


def _attention(bp, xw, nh):
    """xw: (B, nw, 49, C) windows → same shape."""
    b, nw, n, c = xw.shape
    hd = c // nh
    qkv = _lin(bp["qkv"], xw).reshape(b, nw, n, 3, nh, hd)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    attn = jnp.einsum("bwnhd,bwmhd->bwhnm", q, k) / np.sqrt(hd)
    tab = bp["bias_tab"].astype(jnp.float32)
    idx = bp["bias_idx"].astype(jnp.int32)
    bias = tab[idx].reshape(n, n, nh).transpose(2, 0, 1)   # (nh, 49, 49)
    attn = attn + bias[None, None]
    if "mask" in bp:
        attn = attn + bp["mask"][None]                     # (nw, 1, 49, 49)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bwhnm,bwmhd->bwnhd", attn, v).reshape(b, nw, n, c)
    return _lin(bp["proj"], out)


def _block_a(bp, x, nh, shift):
    b, h, w, c = x.shape
    y = _ln(bp["norm1"], x)
    hp = -(-h // WIN) * WIN
    wp = -(-w // WIN) * WIN
    y = jnp.pad(y, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    if shift:
        y = jnp.roll(y, (-SHIFT, -SHIFT), axis=(1, 2))
    yw = y.reshape(b, hp // WIN, WIN, wp // WIN, WIN, c)
    yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, WIN * WIN, c)
    yw = _attention(bp, yw, nh)
    y = yw.reshape(b, hp // WIN, wp // WIN, WIN, WIN, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if shift:
        y = jnp.roll(y, (SHIFT, SHIFT), axis=(1, 2))
    x = x + y[:, :h, :w]
    z = _ln(bp["norm2"], x)
    z = _lin(bp["fc2"], jax.nn.gelu(_lin(bp["fc1"], z), approximate=False))
    return x + z


def _patch_merge(layer, x):
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    y = jnp.concatenate([x0, x1, x2, x3], -1)
    return _lin(layer["down_red"], _ln(layer["down_norm"], y))


def _up(x, s):
    return nn.upsample_bilinear(x, (x.shape[1] * s, x.shape[2] * s))


def _convmodule(cp, x, k):
    return jax.nn.relu(nn.conv2d(x, cp["w"], cp["b"], padding=k // 2))


def apply(params, x, cfg: SwinSegCfg):
    """x: (B, H, W, 3) normalized → (B, H, W) int32 class map."""
    y = nn.conv2d(x, params["patch_w"], params["patch_b"], stride=4)
    y = _ln(params["patch_ln"], y)
    outs: List[jax.Array] = []
    for li, layer in enumerate(params["layers"]):
        nh = HEADS[li]
        for bi, bp in enumerate(layer["blocks"]):
            y = _block_a(bp, y, nh, shift=(bi % 2 == 1))
        outs.append(_ln(params[f"out_norm{li}"], y))
        if "down_red" in layer:
            y = _patch_merge(layer, y)

    lat = [_convmodule(params["lateral"][i], outs[i], 1) for i in range(3)]
    o3 = outs[3]
    h3 = o3.shape[1]
    psp = [o3]
    for i, g in enumerate((1, 2, 3, 6)):
        pooled = nn.avg_pool(o3, h3 // g, h3 // g)
        cm = _convmodule(params["psp"][i], pooled, 1)
        psp.append(_up(cm, h3 // cm.shape[1]))
    o3 = _convmodule(params["bottleneck"], jnp.concatenate(psp, -1), 3)
    # top-down runs on pre-fpn laterals (trainsform.cpp:96-101)
    lat2 = lat[2] + _up(o3, 2)
    lat1 = lat[1] + _up(lat2, 2)
    lat0 = lat[0] + _up(lat1, 2)
    fpn0 = _convmodule(params["fpn"][0], lat0, 3)
    fpn1 = _convmodule(params["fpn"][1], lat1, 3)
    fpn2 = _convmodule(params["fpn"][2], lat2, 3)
    h0 = fpn0.shape[1]
    cat = jnp.concatenate([
        fpn0,
        _up(fpn1, h0 // fpn1.shape[1]),
        _up(fpn2, h0 // fpn2.shape[1]),
        _up(o3, h0 // o3.shape[1]),
    ], -1)
    y = _convmodule(params["fpn_bottleneck"], cat, 3)
    seg = nn.conv2d(y, params["seg_w"].astype(y.dtype),
                    params["seg_b"].astype(y.dtype))
    seg = _up(seg.astype(jnp.float32), 4)
    return jnp.argmax(seg, axis=-1).astype(jnp.int32)


def _prepare(params, cfg: SwinSegCfg):
    """Attach static SW-MSA masks (per stage resolution) to shifted blocks."""
    h = cfg.input_h // 4
    for li, layer in enumerate(params["layers"]):
        hp = -(-h // WIN) * WIN
        mask = jnp.asarray(_sw_mask(hp, hp))
        for bi, bp in enumerate(layer["blocks"]):
            if bi % 2 == 1:
                bp["mask"] = mask
        h //= 2
    return params


_orig_build = build_params


def build_params(wm, cfg: SwinSegCfg):  # noqa: F811 — wrap to attach masks
    return _prepare(_orig_build(wm, cfg), cfg)


register(ModelDef(
    name="swin",
    build_params=build_params,
    apply=apply,
    default_cfg=SwinSegCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Swin-T + UPerNet semantic segmentation (reference: swin-transformer/)",
))
