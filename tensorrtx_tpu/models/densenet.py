"""DenseNet-121 (reference: densenet/densenet121.cpp + densenet121.py;
torchvision densenet121 state_dict). Pre-activation layout (BN→ReLU→conv),
so BN stays a separate scale/shift instead of folding into the conv."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5
BLOCKS = (6, 12, 24, 16)
GROWTH = 32


@dataclasses.dataclass
class DenseNetCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _bn(wm, name, ch):
    gamma = wm.vec(f"{name}.weight", ch)
    beta = wm.vec(f"{name}.bias", ch)
    mean = wm.vec(f"{name}.running_mean", ch)
    var = wm.vec(f"{name}.running_var", ch)
    s = gamma / np.sqrt(var + BN_EPS)
    return {"s": s, "b": beta - mean * s}


def build_params(wm, cfg: DenseNetCfg):
    f = "features"
    p = {
        "conv0": wm.conv2d(f"{f}.conv0", 64, 3, (7, 7), bias=False),
        "norm0": _bn(wm, f"{f}.norm0", 64),
        "blocks": [],
        "trans": [],
    }
    ch = 64
    for bi, n in enumerate(BLOCKS):
        layers = []
        for li in range(n):
            name = f"{f}.denseblock{bi + 1}.denselayer{li + 1}"
            cin = ch + li * GROWTH
            layers.append({
                "n1": _bn(wm, f"{name}.norm1", cin),
                "c1": wm.conv2d(f"{name}.conv1", 4 * GROWTH, cin, (1, 1), bias=False),
                "n2": _bn(wm, f"{name}.norm2", 4 * GROWTH),
                "c2": wm.conv2d(f"{name}.conv2", GROWTH, 4 * GROWTH, (3, 3), bias=False),
            })
        p["blocks"].append(layers)
        ch += n * GROWTH
        if bi < 3:
            name = f"{f}.transition{bi + 1}"
            p["trans"].append({
                "n": _bn(wm, f"{name}.norm", ch),
                "c": wm.conv2d(f"{name}.conv", ch // 2, ch, (1, 1), bias=False),
            })
            ch //= 2
    p["norm5"] = _bn(wm, f"{f}.norm5", ch)
    p["fc"] = wm.linear("classifier", cfg.num_classes, ch)
    return p


def _bn_relu(x, p):
    return jax.nn.relu(x * p["s"].astype(x.dtype) + p["b"].astype(x.dtype))


def apply(params, x, cfg: DenseNetCfg):
    y = nn.conv2d(x, params["conv0"]["w"], None, stride=2, padding=3)
    y = _bn_relu(y, params["norm0"])
    y = nn.max_pool(y, 3, 2, 1)
    for bi, layers in enumerate(params["blocks"]):
        feats = y
        for lp in layers:
            z = _bn_relu(feats, lp["n1"])
            z = nn.conv2d(z, lp["c1"]["w"], None)
            z = _bn_relu(z, lp["n2"])
            z = nn.conv2d(z, lp["c2"]["w"], None, padding=1)
            feats = jnp.concatenate([feats, z], axis=-1)
        y = feats
        if bi < 3:
            tp = params["trans"][bi]
            y = _bn_relu(y, tp["n"])
            y = nn.conv2d(y, tp["c"]["w"], None)
            y = nn.avg_pool(y, 2, 2)
    y = _bn_relu(y, params["norm5"])
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="densenet",
    build_params=build_params,
    apply=apply,
    default_cfg=DenseNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="DenseNet-121 (reference: densenet/)",
))
