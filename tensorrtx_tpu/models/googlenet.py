"""GoogLeNet (reference: googlenet/googlenet.cpp; torchvision googlenet
state_dict — BasicConv2d = conv(bias=False)+BN(eps 1e-3), inception branches
branch1/2/3/4 where branch3 uses a 3×3 conv, torchvision's known quirk)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-3

# inception cfg: (in, b1, b2red, b2, b3red, b3, b4)
_INCEPTIONS = {
    "inception3a": (192, 64, 96, 128, 16, 32, 32),
    "inception3b": (256, 128, 128, 192, 32, 96, 64),
    "inception4a": (480, 192, 96, 208, 16, 48, 64),
    "inception4b": (512, 160, 112, 224, 24, 64, 64),
    "inception4c": (512, 128, 128, 256, 24, 64, 64),
    "inception4d": (512, 112, 144, 288, 32, 64, 64),
    "inception4e": (528, 256, 160, 320, 32, 128, 128),
    "inception5a": (832, 256, 160, 320, 32, 128, 128),
    "inception5b": (832, 384, 192, 384, 48, 128, 128),
}


@dataclasses.dataclass
class GoogLeNetCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _bc(wm, name, co, ci, k):
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (k, k), eps=BN_EPS)


def build_params(wm, cfg: GoogLeNetCfg):
    p = {
        "conv1": _bc(wm, "conv1", 64, 3, 7),
        "conv2": _bc(wm, "conv2", 64, 64, 1),
        "conv3": _bc(wm, "conv3", 192, 64, 3),
        "fc": wm.linear("fc", cfg.num_classes, 1024),
    }
    for name, (ci, b1, b2r, b2, b3r, b3, b4) in _INCEPTIONS.items():
        p[name] = {
            "b1": _bc(wm, f"{name}.branch1", b1, ci, 1),
            "b2a": _bc(wm, f"{name}.branch2.0", b2r, ci, 1),
            "b2b": _bc(wm, f"{name}.branch2.1", b2, b2r, 3),
            "b3a": _bc(wm, f"{name}.branch3.0", b3r, ci, 1),
            "b3b": _bc(wm, f"{name}.branch3.1", b3, b3r, 3),
            "b4": _bc(wm, f"{name}.branch4.1", b4, ci, 1),
        }
    return p


def _bc_a(p, x, stride=1):
    k = p["w"].shape[0]
    return jax.nn.relu(nn.conv2d(x, p["w"], p["b"], stride=stride, padding=k // 2))


def _inception_a(p, x):
    y1 = _bc_a(p["b1"], x)
    y2 = _bc_a(p["b2b"], _bc_a(p["b2a"], x))
    y3 = _bc_a(p["b3b"], _bc_a(p["b3a"], x))
    y4 = _bc_a(p["b4"], nn.max_pool(x, 3, 1, 1))
    return jnp.concatenate([y1, y2, y3, y4], axis=-1)


def _ceil_pool(x, k=3):
    """torch MaxPool2d(k, 2, ceil_mode=True): pad right/bottom so the last
    partial window counts. maxpool1-3 use k=3; maxpool4 uses k=2."""
    h, w = x.shape[1], x.shape[2]
    ph = 0 if (h - k) % 2 == 0 else 1
    pw = 0 if (w - k) % 2 == 0 else 1
    neg = jnp.finfo(x.dtype).min
    return jax.lax.reduce_window(
        x, neg, jax.lax.max, (1, k, k, 1), (1, 2, 2, 1),
        [(0, 0), (0, ph), (0, pw), (0, 0)])


def apply(params, x, cfg: GoogLeNetCfg):
    y = _bc_a(params["conv1"], x, stride=2)
    y = _ceil_pool(y)
    y = _bc_a(params["conv2"], y)
    y = _bc_a(params["conv3"], y)
    y = _ceil_pool(y)
    y = _inception_a(params["inception3a"], y)
    y = _inception_a(params["inception3b"], y)
    y = _ceil_pool(y)
    for n in ("4a", "4b", "4c", "4d", "4e"):
        y = _inception_a(params[f"inception{n}"], y)
    y = _ceil_pool(y, k=2)
    y = _inception_a(params["inception5a"], y)
    y = _inception_a(params["inception5b"], y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="googlenet",
    build_params=build_params,
    apply=apply,
    default_cfg=GoogLeNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="GoogLeNet (reference: googlenet/)",
))
