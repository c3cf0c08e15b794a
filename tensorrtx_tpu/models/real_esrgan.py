"""Real-ESRGAN x4plus super-resolution (reference: real-esrgan/x4plus/
real-esrgan.cpp + common.hpp — BasicSR RRDBNet: conv_first, 23 RRDB blocks
(each 3 ResidualDenseBlocks with 5 growth convs, residual scale 0.2),
conv_body, 2× nearest-upsample + conv stages, conv_hr/conv_last; GPU uint8↔
float pre/post kernels become fused expressions here).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class RealEsrganCfg:
    num_feat: int = 64
    num_grow: int = 32
    num_blocks: int = 23
    scale: int = 4
    input_h: int = 128
    input_w: int = 128


def _conv(wm, name, co, ci, k=3):
    return wm.conv2d(name, co, ci, (k, k))


def _rdb_p(wm, name, nf, gc):
    return [
        _conv(wm, f"{name}.conv1", gc, nf),
        _conv(wm, f"{name}.conv2", gc, nf + gc),
        _conv(wm, f"{name}.conv3", gc, nf + 2 * gc),
        _conv(wm, f"{name}.conv4", gc, nf + 3 * gc),
        _conv(wm, f"{name}.conv5", nf, nf + 4 * gc),
    ]


def build_params(wm, cfg: RealEsrganCfg):
    nf, gc = cfg.num_feat, cfg.num_grow
    p = {
        "conv_first": _conv(wm, "conv_first", nf, 3),
        "body": [{f"rdb{j}": _rdb_p(wm, f"body.{i}.rdb{j}", nf, gc)
                  for j in (1, 2, 3)} for i in range(cfg.num_blocks)],
        "conv_body": _conv(wm, "conv_body", nf, nf),
        "conv_up1": _conv(wm, "conv_up1", nf, nf),
        "conv_up2": _conv(wm, "conv_up2", nf, nf),
        "conv_hr": _conv(wm, "conv_hr", nf, nf),
        "conv_last": _conv(wm, "conv_last", 3, nf),
    }
    return p


def _lrelu(x):
    return nn.leaky_relu(x, 0.2)


def _rdb_a(convs, x):
    x1 = _lrelu(nn.conv2d(x, convs[0]["w"], convs[0]["b"], padding=1))
    x2 = _lrelu(nn.conv2d(jnp.concatenate([x, x1], -1), convs[1]["w"], convs[1]["b"], padding=1))
    x3 = _lrelu(nn.conv2d(jnp.concatenate([x, x1, x2], -1), convs[2]["w"], convs[2]["b"], padding=1))
    x4 = _lrelu(nn.conv2d(jnp.concatenate([x, x1, x2, x3], -1), convs[3]["w"], convs[3]["b"], padding=1))
    x5 = nn.conv2d(jnp.concatenate([x, x1, x2, x3, x4], -1), convs[4]["w"], convs[4]["b"], padding=1)
    return x5 * 0.2 + x


def apply(params, x, cfg: RealEsrganCfg):
    """x: (B, H, W, 3) in [0,1] → (B, 4H, 4W, 3) in [0,1]."""
    feat = nn.conv2d(x, params["conv_first"]["w"], params["conv_first"]["b"], padding=1)
    y = feat
    for blk in params["body"]:
        z = _rdb_a(blk["rdb1"], y)
        z = _rdb_a(blk["rdb2"], z)
        z = _rdb_a(blk["rdb3"], z)
        y = z * 0.2 + y
    y = nn.conv2d(y, params["conv_body"]["w"], params["conv_body"]["b"], padding=1)
    feat = feat + y
    y = nn.upsample_nearest(feat, 2)
    y = _lrelu(nn.conv2d(y, params["conv_up1"]["w"], params["conv_up1"]["b"], padding=1))
    y = nn.upsample_nearest(y, 2)
    y = _lrelu(nn.conv2d(y, params["conv_up2"]["w"], params["conv_up2"]["b"], padding=1))
    y = _lrelu(nn.conv2d(y, params["conv_hr"]["w"], params["conv_hr"]["b"], padding=1))
    return nn.conv2d(y, params["conv_last"]["w"], params["conv_last"]["b"], padding=1)


def postprocess_to_uint8(out) -> "jnp.ndarray":
    """clamp [0,1] → uint8 image (postprocess.cu:6)."""
    return jnp.round(jnp.clip(out, 0.0, 1.0) * 255.0).astype(jnp.uint8)


register(ModelDef(
    name="real-esrgan",
    build_params=build_params,
    apply=apply,
    default_cfg=RealEsrganCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Real-ESRGAN x4plus RRDBNet SR (reference: real-esrgan/)",
))


# ---- general-x4v3 (SRVGGNetCompact; real-esrgan/general-x4v3/main.cpp) -----

@dataclasses.dataclass
class EsrganX4v3Cfg:
    num_conv: int = 32
    num_feat: int = 64
    scale: int = 4
    input_h: int = 128
    input_w: int = 128


def build_x4v3_params(wm, cfg: EsrganX4v3Cfg):
    """body.0 conv + PReLU body.1, then 32× (conv body.2i+2 + PReLU
    body.2i+3), conv_last body.66 → 48ch pixel-shuffle ×4 + nearest-up
    residual (main.cpp:95-131)."""
    p = {"convs": [], "prelus": []}
    cin = 3
    for i in range(cfg.num_conv + 1):
        p["convs"].append(_conv(wm, f"body.{2 * i}", cfg.num_feat, cin))
        p["prelus"].append(wm.vec(f"body.{2 * i + 1}.weight", cfg.num_feat))
        cin = cfg.num_feat
    p["conv_last"] = _conv(wm, f"body.{2 * (cfg.num_conv + 1)}",
                           3 * cfg.scale ** 2, cfg.num_feat)
    return p


def x4v3_apply(params, x, cfg: EsrganX4v3Cfg):
    """x: (B, H, W, 3) in [0,1] → (B, 4H, 4W, 3)."""
    y = x
    for cp, slope in zip(params["convs"], params["prelus"]):
        y = nn.conv2d(y, cp["w"], cp["b"], padding=1)
        y = nn.prelu(y, slope)
    y = nn.conv2d(y, params["conv_last"]["w"], params["conv_last"]["b"],
                  padding=1)
    up = nn.pixel_shuffle(y, cfg.scale)
    base = nn.upsample_nearest(x, cfg.scale)
    return up + base.astype(up.dtype)


register(ModelDef(
    name="real-esrgan-x4v3",
    build_params=build_x4v3_params,
    apply=x4v3_apply,
    default_cfg=EsrganX4v3Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Real-ESRGAN general-x4v3 compact SR "
        "(reference: real-esrgan/general-x4v3/)",
))
