"""ConvNeXt V2 classifier (atto-style config by default).

Reference: convnextv2/src/convnextv2.cpp (blocks :162-301 — dw7x7 →
channel-LN (LayerNormPlugin.cu:42) → pw 4x → GELU-erf → GRN → pw → residual;
stem conv4x4 s4 + LN; downsample LN + conv2x2 s2; head GAP → LN → 1x1).

NHWC-native: the reference's permute-to-NHWC-for-LN dance disappears —
the tensor already lives channels-last, LN is a fused jnp op.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class ConvnextCfg:
    depths: Tuple[int, ...] = (2, 2, 8, 2)     # convnextv2.cpp:28-35 (atto)
    dims: Tuple[int, ...] = (80, 160, 320, 640)
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _conv(wm, name, co, ci, k):
    w = wm.tensor(f"{name}.weight", (co, ci, k, k))
    return {"w": np.transpose(w, (2, 3, 1, 0)),
            "b": wm.vec(f"{name}.bias", co)}


def _ln(wm, name, ch):
    return {"g": wm.vec(f"{name}.weight", ch), "b": wm.vec(f"{name}.bias", ch)}


def _block_p(wm, name, dim):
    dw = wm.tensor(f"{name}.dwconv.weight", (dim, 1, 7, 7))
    return {
        "dw": {"w": np.transpose(dw, (2, 3, 1, 0)),
               "b": wm.vec(f"{name}.dwconv.bias", dim)},
        "ln": _ln(wm, f"{name}.norm", dim),
        "pw1": {"w": wm.tensor(f"{name}.pwconv1.weight", (4 * dim, dim)).T
                .copy(), "b": wm.vec(f"{name}.pwconv1.bias", 4 * dim)},
        "grn_g": wm.vec(f"{name}.grn.gamma", 4 * dim),
        "grn_b": wm.vec(f"{name}.grn.beta", 4 * dim),
        "pw2": {"w": wm.tensor(f"{name}.pwconv2.weight", (dim, 4 * dim)).T
                .copy(), "b": wm.vec(f"{name}.pwconv2.bias", dim)},
    }


def build_params(wm, cfg: ConvnextCfg):
    dims = cfg.dims
    p = {"stem": _conv(wm, "downsample_layers.0.0", dims[0], 3, 4),
         "stem_ln": _ln(wm, "downsample_layers.0.1", dims[0]),
         "stages": [], "ds": []}
    for i in range(4):
        if i > 0:
            p["ds"].append({
                "ln": _ln(wm, f"downsample_layers.{i}.0", dims[i - 1]),
                "conv": _conv(wm, f"downsample_layers.{i}.1", dims[i],
                              dims[i - 1], 2)})
        p["stages"].append([_block_p(wm, f"stages.{i}.{j}", dims[i])
                            for j in range(cfg.depths[i])])
    p["norm"] = _ln(wm, "norm", dims[3])
    p["head"] = {"w": wm.tensor("head.weight", (cfg.num_classes, dims[3])).T
                 .copy(), "b": wm.vec("head.bias", cfg.num_classes)}
    return p


def _layer_norm(x, p, eps=1e-6):
    return nn.layer_norm(x, p["g"].astype(x.dtype), p["b"].astype(x.dtype),
                         eps=eps)


def _grn(x, gamma, beta, eps=1e-6):
    """Global Response Normalization (convnextv2.cpp:239-289)."""
    gx = jnp.sqrt(jnp.sum(jnp.square(x), axis=(1, 2), keepdims=True))
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + eps)
    return x * nx * gamma.astype(x.dtype) + beta.astype(x.dtype) + x


def _block_a(bp, x):
    dim = x.shape[-1]
    y = nn.conv2d(x, bp["dw"]["w"], bp["dw"]["b"], padding=3, groups=dim)
    y = _layer_norm(y, bp["ln"])
    y = y @ bp["pw1"]["w"].astype(y.dtype) + bp["pw1"]["b"].astype(y.dtype)
    y = nn.gelu_erf(y)
    y = _grn(y, bp["grn_g"], bp["grn_b"])
    y = y @ bp["pw2"]["w"].astype(y.dtype) + bp["pw2"]["b"].astype(y.dtype)
    return x + y


def apply(params, x, cfg: ConvnextCfg):
    """x: (B, H, W, 3) imagenet-normalized → logits (B, num_classes)."""
    y = nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=4)
    y = _layer_norm(y, params["stem_ln"])
    for i in range(4):
        if i > 0:
            ds = params["ds"][i - 1]
            y = _layer_norm(y, ds["ln"])
            y = nn.conv2d(y, ds["conv"]["w"], ds["conv"]["b"], stride=2)
        for bp in params["stages"][i]:
            y = _block_a(bp, y)
    y = jnp.mean(y, axis=(1, 2))
    y = _layer_norm(y, params["norm"])
    return y @ params["head"]["w"].astype(y.dtype) + \
        params["head"]["b"].astype(y.dtype)


register(ModelDef(
    name="convnextv2",
    build_params=build_params,
    apply=apply,
    default_cfg=ConvnextCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ConvNeXt V2 classifier (reference: convnextv2/)",
))
