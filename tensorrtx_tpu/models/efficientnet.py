"""EfficientNet b0–b7 (reference: efficientnet/efficientnet.cpp + utils.hpp —
lukemelas/EfficientNet-PyTorch layout: _conv_stem/_bn0, _blocks.N with
_expand_conv/_bn0, _depthwise_conv/_bn1, _se_reduce/_se_expand,
_project_conv/_bn2, head _conv_head/_bn1/_fc; swish activations, TF-style
SAME padding — XLA's 'SAME' is exactly the reference's
addSamePaddingConv2d)."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-3

# (repeats, kernel, stride, expand, in, out) with se_ratio 0.25
_BLOCK_ARGS = [
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]

# variant: (width_coeff, depth_coeff, resolution)
COEFFS = {
    "b0": (1.0, 1.0, 224), "b1": (1.0, 1.1, 240), "b2": (1.1, 1.2, 260),
    "b3": (1.2, 1.4, 300), "b4": (1.4, 1.8, 380), "b5": (1.6, 2.2, 456),
    "b6": (1.8, 2.6, 528), "b7": (2.0, 3.1, 600),
}


@dataclasses.dataclass
class EfficientNetCfg:
    variant: str = "b0"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def round_filters(f, wcoef, divisor=8):
    f *= wcoef
    new = max(divisor, int(f + divisor / 2) // divisor * divisor)
    if new < 0.9 * f:
        new += divisor
    return int(new)


def round_repeats(r, dcoef):
    return int(math.ceil(dcoef * r))


def swish(x):
    return x * jax.nn.sigmoid(x)


def _cbn(wm, cname, bnname, co, ci, k, groups=1):
    return wm.conv_bn(cname, bnname, co, ci, (k, k), groups=groups, eps=BN_EPS)


def build_params(wm, cfg: EfficientNetCfg):
    wc, dc, _ = COEFFS[cfg.variant]
    stem_c = round_filters(32, wc)
    p = {"stem": _cbn(wm, "_conv_stem", "_bn0", stem_c, 3, 3), "blocks": []}
    bi = 0
    for (r, k, s, e, ci, co) in _BLOCK_ARGS:
        ci_r = round_filters(ci, wc)
        co_r = round_filters(co, wc)
        for rep in range(round_repeats(r, dc)):
            name = f"_blocks.{bi}"
            cin = ci_r if rep == 0 else co_r
            stride = s if rep == 0 else 1
            hid = cin * e
            bp = {}
            if e != 1:
                bp["expand"] = _cbn(wm, f"{name}._expand_conv", f"{name}._bn0",
                                    hid, cin, 1)
            bp["dw"] = _cbn(wm, f"{name}._depthwise_conv", f"{name}._bn1",
                            hid, hid, k, groups=hid)
            c_se = max(1, int(cin * 0.25))
            bp["se_r"] = wm.conv2d(f"{name}._se_reduce", c_se, hid, (1, 1))
            bp["se_e"] = wm.conv2d(f"{name}._se_expand", hid, c_se, (1, 1))
            bp["proj"] = _cbn(wm, f"{name}._project_conv", f"{name}._bn2",
                              co_r, hid, 1)
            p["blocks"].append(bp)
            bi += 1
    head_c = round_filters(1280, wc)
    p["head"] = _cbn(wm, "_conv_head", "_bn1", head_c, co_r, 1)
    p["fc"] = wm.linear("_fc", cfg.num_classes, head_c)
    return p


def _strides_kernels(cfg):
    wc, dc, _ = COEFFS[cfg.variant]
    out = []
    for (r, k, s, e, ci, co) in _BLOCK_ARGS:
        for rep in range(round_repeats(r, dc)):
            out.append((k, s if rep == 0 else 1, e))
    return out


def apply(params, x, cfg: EfficientNetCfg):
    y = swish(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2,
                        padding="SAME"))
    for bp, (k, s, e) in zip(params["blocks"], _strides_kernels(cfg)):
        inp = y
        if "expand" in bp:
            y = swish(nn.conv2d(y, bp["expand"]["w"], bp["expand"]["b"]))
        g = bp["dw"]["w"].shape[3]
        y = swish(nn.conv2d(y, bp["dw"]["w"], bp["dw"]["b"], stride=s,
                            padding="SAME", groups=g))
        se = nn.global_avg_pool(y, keepdims=True)
        se = swish(nn.conv2d(se, bp["se_r"]["w"], bp["se_r"]["b"]))
        se = jax.nn.sigmoid(nn.conv2d(se, bp["se_e"]["w"], bp["se_e"]["b"]))
        y = y * se
        y = nn.conv2d(y, bp["proj"]["w"], bp["proj"]["b"])
        if s == 1 and inp.shape[-1] == y.shape[-1]:
            y = y + inp
    y = swish(nn.conv2d(y, params["head"]["w"], params["head"]["b"]))
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="efficientnet",
    build_params=build_params,
    apply=apply,
    default_cfg=EfficientNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="EfficientNet b0-b7 (reference: efficientnet/)",
))
