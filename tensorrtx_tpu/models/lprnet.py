"""LPRNet license-plate recognition (reference: lprnet/lprnet.cpp —
sirius-ai/LPRNet_Pytorch: smallBasicBlocks, MaxPool3d layers that stride the
CHANNEL dimension (expressed here as one reduce_window over NHWC), global
context branches (x / mean(x²)) and a 1×1 container head; output (B, nc, 18)
CTC logits over plate positions. Input 24×94 RGB, (x-127.5)/128 normalize."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


@dataclasses.dataclass
class LprnetCfg:
    num_classes: int = 68
    input_h: int = 24
    input_w: int = 94


def _cb(wm, ci_name, bn_name, co, ci, k):
    return wm.conv_bn(ci_name, bn_name, co, ci, k, eps=BN_EPS)


def _sbb(wm, name, cin, cout):
    o = cout // 4
    return [
        wm.conv2d(f"{name}.block.0", o, cin, (1, 1)),
        wm.conv2d(f"{name}.block.2", o, o, (3, 1)),
        wm.conv2d(f"{name}.block.4", o, o, (1, 3)),
        wm.conv2d(f"{name}.block.6", cout, o, (1, 1)),
    ]


def build_params(wm, cfg: LprnetCfg):
    return {
        "c0": _cb(wm, "backbone.0", "backbone.1", 64, 3, (3, 3)),
        "b4": _sbb(wm, "backbone.4", 64, 128),
        "bn5": wm.bn("backbone.5", 128, BN_EPS),
        "b8": _sbb(wm, "backbone.8", 64, 256),
        "bn9": wm.bn("backbone.9", 256, BN_EPS),
        "b11": _sbb(wm, "backbone.11", 256, 256),
        "bn12": wm.bn("backbone.12", 256, BN_EPS),
        "c16": _cb(wm, "backbone.16", "backbone.17", 256, 64, (1, 4)),
        "c20": _cb(wm, "backbone.20", "backbone.21", cfg.num_classes, 256, (13, 1)),
        "container": wm.conv2d("container.0", cfg.num_classes,
                               64 + 128 + 256 + cfg.num_classes, (1, 1)),
    }


def _sbb_a(convs, x):
    pads = [(0, 0), (1, 0), (0, 1), (0, 0)]
    for i, (cp, p) in enumerate(zip(convs, pads)):
        x = nn.conv2d(x, cp["w"], cp["b"], padding=p)
        if i < 3:
            x = jax.nn.relu(x)
    return x


def _pool3d(x, c_stride, w_stride):
    """MaxPool3d k(1,3,3) with channel stride — the reference's 5D-shuffle
    trick, done directly as one NHWC reduce_window."""
    return lax.reduce_window(
        x, jnp.finfo(x.dtype).min, lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, w_stride, c_stride),
        padding=[(0, 0)] * 4)


def _gc(x, pool5=False, pool4x10=False):
    """Global context (lprnet.cpp:188-234): optional avg pool, then x/mean(x²)."""
    if pool5:
        x = nn.avg_pool(x, 5, 5)
    if pool4x10:
        x = lax.reduce_window(
            x, jnp.array(0, x.dtype), lax.add,
            window_dimensions=(1, 4, 10, 1), window_strides=(1, 4, 2, 1),
            padding=[(0, 0)] * 4) / jnp.array(40.0, x.dtype)
    m = jnp.mean(jnp.square(x), axis=(1, 2, 3), keepdims=True)
    return x / m


def apply(params, x, cfg: LprnetCfg):
    """x: (B, 24, 94, 3) normalized → (B, num_classes, 18) CTC logits."""
    y = jax.nn.relu(nn.conv2d(x, params["c0"]["w"], params["c0"]["b"]))
    keep0 = y                                         # 22×92×64
    y = nn.max_pool(y, 3, 1)                          # 20×90
    y = _sbb_a(params["b4"], y)
    s, b = params["bn5"]
    y = jax.nn.relu(y * jnp.asarray(s, y.dtype) + jnp.asarray(b, y.dtype))
    keep1 = y                                         # 20×90×128
    y = _pool3d(y, c_stride=2, w_stride=2)            # 18×44×64
    y = _sbb_a(params["b8"], y)
    s, b = params["bn9"]
    y = jax.nn.relu(y * jnp.asarray(s, y.dtype) + jnp.asarray(b, y.dtype))
    y = _sbb_a(params["b11"], y)
    s, b = params["bn12"]
    y = jax.nn.relu(y * jnp.asarray(s, y.dtype) + jnp.asarray(b, y.dtype))
    keep2 = y                                         # 18×44×256
    y = _pool3d(y, c_stride=4, w_stride=2)            # 16×21×64
    y = jax.nn.relu(nn.conv2d(y, params["c16"]["w"], params["c16"]["b"]))  # 16×18
    y = jax.nn.relu(nn.conv2d(y, params["c20"]["w"], params["c20"]["b"]))  # 4×18
    gc = jnp.concatenate([
        _gc(keep0, pool5=True), _gc(keep1, pool5=True),
        _gc(keep2, pool4x10=True), _gc(y)], axis=-1)   # 4×18×(516)
    logits = nn.conv2d(gc, params["container"]["w"], params["container"]["b"])
    # average over H → (B, W=18, nc) → transpose to (B, nc, 18) like the ref
    logits = jnp.mean(logits, axis=1)
    return jnp.transpose(logits, (0, 2, 1))


register(ModelDef(
    name="lprnet",
    build_params=build_params,
    apply=apply,
    default_cfg=LprnetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="LPRNet plate recognition (reference: lprnet/)",
))
