"""Inception-v3 (reference: inception/inceptionv3/ — torchvision
inception_v3 state_dict: Conv2d_*, Mixed_5b..7c with branch* BasicConv2d
(conv bias=False + BN eps 1e-3), fc). Asymmetric 1×7/7×1 factorized convs
run as-is (XLA handles rectangular kernels natively)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-3


@dataclasses.dataclass
class InceptionCfg:
    variant: str = "v3"
    num_classes: int = 1000
    input_h: int = 299
    input_w: int = 299


def _bc(wm, name, co, ci, kh, kw=None):
    kw = kw if kw is not None else kh
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (kh, kw), eps=BN_EPS)


def build_params(wm, cfg: InceptionCfg):
    p = {
        "c1a": _bc(wm, "Conv2d_1a_3x3", 32, 3, 3),
        "c2a": _bc(wm, "Conv2d_2a_3x3", 32, 32, 3),
        "c2b": _bc(wm, "Conv2d_2b_3x3", 64, 32, 3),
        "c3b": _bc(wm, "Conv2d_3b_1x1", 80, 64, 1),
        "c4a": _bc(wm, "Conv2d_4a_3x3", 192, 80, 3),
        "fc": wm.linear("fc", cfg.num_classes, 2048),
    }
    for name, cin, pf in (("Mixed_5b", 192, 32), ("Mixed_5c", 256, 64),
                          ("Mixed_5d", 288, 64)):
        p[name] = {
            "b1": _bc(wm, f"{name}.branch1x1", 64, cin, 1),
            "b5_1": _bc(wm, f"{name}.branch5x5_1", 48, cin, 1),
            "b5_2": _bc(wm, f"{name}.branch5x5_2", 64, 48, 5),
            "d1": _bc(wm, f"{name}.branch3x3dbl_1", 64, cin, 1),
            "d2": _bc(wm, f"{name}.branch3x3dbl_2", 96, 64, 3),
            "d3": _bc(wm, f"{name}.branch3x3dbl_3", 96, 96, 3),
            "bp": _bc(wm, f"{name}.branch_pool", pf, cin, 1),
        }
    p["Mixed_6a"] = {
        "b3": _bc(wm, "Mixed_6a.branch3x3", 384, 288, 3),
        "d1": _bc(wm, "Mixed_6a.branch3x3dbl_1", 64, 288, 1),
        "d2": _bc(wm, "Mixed_6a.branch3x3dbl_2", 96, 64, 3),
        "d3": _bc(wm, "Mixed_6a.branch3x3dbl_3", 96, 96, 3),
    }
    for name, c7 in (("Mixed_6b", 128), ("Mixed_6c", 160), ("Mixed_6d", 160),
                     ("Mixed_6e", 192)):
        p[name] = {
            "b1": _bc(wm, f"{name}.branch1x1", 192, 768, 1),
            "q1": _bc(wm, f"{name}.branch7x7_1", c7, 768, 1),
            "q2": _bc(wm, f"{name}.branch7x7_2", c7, c7, 1, 7),
            "q3": _bc(wm, f"{name}.branch7x7_3", 192, c7, 7, 1),
            "d1": _bc(wm, f"{name}.branch7x7dbl_1", c7, 768, 1),
            "d2": _bc(wm, f"{name}.branch7x7dbl_2", c7, c7, 7, 1),
            "d3": _bc(wm, f"{name}.branch7x7dbl_3", c7, c7, 1, 7),
            "d4": _bc(wm, f"{name}.branch7x7dbl_4", c7, c7, 7, 1),
            "d5": _bc(wm, f"{name}.branch7x7dbl_5", 192, c7, 1, 7),
            "bp": _bc(wm, f"{name}.branch_pool", 192, 768, 1),
        }
    p["Mixed_7a"] = {
        "b1": _bc(wm, "Mixed_7a.branch3x3_1", 192, 768, 1),
        "b2": _bc(wm, "Mixed_7a.branch3x3_2", 320, 192, 3),
        "q1": _bc(wm, "Mixed_7a.branch7x7x3_1", 192, 768, 1),
        "q2": _bc(wm, "Mixed_7a.branch7x7x3_2", 192, 192, 1, 7),
        "q3": _bc(wm, "Mixed_7a.branch7x7x3_3", 192, 192, 7, 1),
        "q4": _bc(wm, "Mixed_7a.branch7x7x3_4", 192, 192, 3),
    }
    for name, cin in (("Mixed_7b", 1280), ("Mixed_7c", 2048)):
        p[name] = {
            "b1": _bc(wm, f"{name}.branch1x1", 320, cin, 1),
            "b3_1": _bc(wm, f"{name}.branch3x3_1", 384, cin, 1),
            "b3_2a": _bc(wm, f"{name}.branch3x3_2a", 384, 384, 1, 3),
            "b3_2b": _bc(wm, f"{name}.branch3x3_2b", 384, 384, 3, 1),
            "d1": _bc(wm, f"{name}.branch3x3dbl_1", 448, cin, 1),
            "d2": _bc(wm, f"{name}.branch3x3dbl_2", 384, 448, 3),
            "d3a": _bc(wm, f"{name}.branch3x3dbl_3a", 384, 384, 1, 3),
            "d3b": _bc(wm, f"{name}.branch3x3dbl_3b", 384, 384, 3, 1),
            "bp": _bc(wm, f"{name}.branch_pool", 192, cin, 1),
        }
    return p


def _a(pp, x, stride=1, pad=None):
    kh, kw = pp["w"].shape[0], pp["w"].shape[1]
    if pad is None:
        pad = (0, 0)
    y = nn.conv2d(x, pp["w"], pp["b"], stride=stride,
                  padding=(pad if isinstance(pad, tuple) else (pad, pad)))
    return jax.nn.relu(y)


def _avgp(x):
    return nn.avg_pool(x, 3, 1, 1, count_include_pad=True)


def _inc_a(p, x):
    b1 = _a(p["b1"], x)
    b5 = _a(p["b5_2"], _a(p["b5_1"], x), pad=2)
    d = _a(p["d3"], _a(p["d2"], _a(p["d1"], x), pad=1), pad=1)
    bp = _a(p["bp"], _avgp(x))
    return jnp.concatenate([b1, b5, d, bp], -1)


def _inc_c(p, x):
    b1 = _a(p["b1"], x)
    q = _a(p["q3"], _a(p["q2"], _a(p["q1"], x), pad=(0, 3)), pad=(3, 0))
    d = _a(p["d1"], x)
    d = _a(p["d2"], d, pad=(3, 0))
    d = _a(p["d3"], d, pad=(0, 3))
    d = _a(p["d4"], d, pad=(3, 0))
    d = _a(p["d5"], d, pad=(0, 3))
    bp = _a(p["bp"], _avgp(x))
    return jnp.concatenate([b1, q, d, bp], -1)


def _inc_e(p, x):
    b1 = _a(p["b1"], x)
    b3 = _a(p["b3_1"], x)
    b3 = jnp.concatenate([_a(p["b3_2a"], b3, pad=(0, 1)),
                          _a(p["b3_2b"], b3, pad=(1, 0))], -1)
    d = _a(p["d2"], _a(p["d1"], x), pad=1)
    d = jnp.concatenate([_a(p["d3a"], d, pad=(0, 1)),
                         _a(p["d3b"], d, pad=(1, 0))], -1)
    bp = _a(p["bp"], _avgp(x))
    return jnp.concatenate([b1, b3, d, bp], -1)


def apply(params, x, cfg: InceptionCfg):
    y = _a(params["c1a"], x, stride=2)
    y = _a(params["c2a"], y)
    y = _a(params["c2b"], y, pad=1)
    y = nn.max_pool(y, 3, 2)
    y = _a(params["c3b"], y)
    y = _a(params["c4a"], y)
    y = nn.max_pool(y, 3, 2)
    for n in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
        y = _inc_a(params[n], y)
    p = params["Mixed_6a"]
    b3 = _a(p["b3"], y, stride=2)
    d = _a(p["d3"], _a(p["d2"], _a(p["d1"], y), pad=1), stride=2)
    y = jnp.concatenate([b3, d, nn.max_pool(y, 3, 2)], -1)
    for n in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        y = _inc_c(params[n], y)
    p = params["Mixed_7a"]
    b3 = _a(p["b2"], _a(p["b1"], y), stride=2)
    q = _a(p["q1"], y)
    q = _a(p["q2"], q, pad=(0, 3))
    q = _a(p["q3"], q, pad=(3, 0))
    q = _a(p["q4"], q, stride=2)
    y = jnp.concatenate([b3, q, nn.max_pool(y, 3, 2)], -1)
    y = _inc_e(params["Mixed_7b"], y)
    y = _inc_e(params["Mixed_7c"], y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="inception",
    build_params=build_params,
    apply=apply,
    default_cfg=InceptionCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Inception-v3 (reference: inception/inceptionv3/)",
))
