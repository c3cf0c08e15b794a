"""Inception-v4 classifier.

Reference: inception/inceptionv4/inception_v4.cpp:28-90 +
layers_api.cpp:45-340 (basicConv2d = conv+BN(eps 1e-3)+relu; mixed_3a/4a/5a
stem, 4×inceptionA, reductionA, 7×inceptionB, reductionB, 3×inceptionC,
8x8 GAP → last_linear). Weight naming: features.N.<branch>.conv/.bn.

Takes pre-normalized NHWC input (the reference folds mean/std into a scale
layer; our classify task driver normalizes on host).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-3


@dataclasses.dataclass
class Inceptionv4Cfg:
    num_classes: int = 1000
    input_h: int = 299
    input_w: int = 299


def _bc(wm, name, co, ci, kh, kw=None):
    kw = kw if kw is not None else kh
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (kh, kw),
                      eps=BN_EPS)


def _a(pp, x, stride=1, pad=(0, 0)):
    return jax.nn.relu(nn.conv2d(x, pp["w"], pp["b"], stride=stride,
                                 padding=pad))


def _avg3(x):
    return nn.avg_pool(x, 3, 1, 1)


def build_params(wm, cfg: Inceptionv4Cfg):
    p = {"s0": _bc(wm, "features.0", 32, 3, 3),
         "s1": _bc(wm, "features.1", 32, 32, 3),
         "s2": _bc(wm, "features.2", 64, 32, 3),
         "m3a": _bc(wm, "features.3.conv", 96, 64, 3),
         "m4a_b0": [_bc(wm, "features.4.branch0.0", 64, 160, 1),
                    _bc(wm, "features.4.branch0.1", 96, 64, 3)],
         "m4a_b1": [_bc(wm, "features.4.branch1.0", 64, 160, 1),
                    _bc(wm, "features.4.branch1.1", 64, 64, 1, 7),
                    _bc(wm, "features.4.branch1.2", 64, 64, 7, 1),
                    _bc(wm, "features.4.branch1.3", 96, 64, 3)],
         "m5a": _bc(wm, "features.5.conv", 192, 192, 3)}
    for i in range(6, 10):  # inceptionA ×4, cin 384
        n = f"features.{i}"
        p[n] = {"b0": _bc(wm, f"{n}.branch0", 96, 384, 1),
                "b1": [_bc(wm, f"{n}.branch1.0", 64, 384, 1),
                       _bc(wm, f"{n}.branch1.1", 96, 64, 3)],
                "b2": [_bc(wm, f"{n}.branch2.0", 64, 384, 1),
                       _bc(wm, f"{n}.branch2.1", 96, 64, 3),
                       _bc(wm, f"{n}.branch2.2", 96, 96, 3)],
                "b3": _bc(wm, f"{n}.branch3.1", 96, 384, 1)}
    p["red_a"] = {"b0": _bc(wm, "features.10.branch0", 384, 384, 3),
                  "b1": [_bc(wm, "features.10.branch1.0", 192, 384, 1),
                         _bc(wm, "features.10.branch1.1", 224, 192, 3),
                         _bc(wm, "features.10.branch1.2", 256, 224, 3)]}
    for i in range(11, 18):  # inceptionB ×7, cin 1024
        n = f"features.{i}"
        p[n] = {"b0": _bc(wm, f"{n}.branch0", 384, 1024, 1),
                "b1": [_bc(wm, f"{n}.branch1.0", 192, 1024, 1),
                       _bc(wm, f"{n}.branch1.1", 224, 192, 1, 7),
                       _bc(wm, f"{n}.branch1.2", 256, 224, 7, 1)],
                "b2": [_bc(wm, f"{n}.branch2.0", 192, 1024, 1),
                       _bc(wm, f"{n}.branch2.1", 192, 192, 7, 1),
                       _bc(wm, f"{n}.branch2.2", 224, 192, 1, 7),
                       _bc(wm, f"{n}.branch2.3", 224, 224, 7, 1),
                       _bc(wm, f"{n}.branch2.4", 256, 224, 1, 7)],
                "b3": _bc(wm, f"{n}.branch3.1", 128, 1024, 1)}
    p["red_b"] = {"b0": [_bc(wm, "features.18.branch0.0", 192, 1024, 1),
                         _bc(wm, "features.18.branch0.1", 192, 192, 3)],
                  "b1": [_bc(wm, "features.18.branch1.0", 256, 1024, 1),
                         _bc(wm, "features.18.branch1.1", 256, 256, 1, 7),
                         _bc(wm, "features.18.branch1.2", 320, 256, 7, 1),
                         _bc(wm, "features.18.branch1.3", 320, 320, 3)]}
    for i in range(19, 22):  # inceptionC ×3, cin 1536
        n = f"features.{i}"
        p[n] = {"b0": _bc(wm, f"{n}.branch0", 256, 1536, 1),
                "b1_0": _bc(wm, f"{n}.branch1_0", 384, 1536, 1),
                "b1_1a": _bc(wm, f"{n}.branch1_1a", 256, 384, 1, 3),
                "b1_1b": _bc(wm, f"{n}.branch1_1b", 256, 384, 3, 1),
                "b2_0": _bc(wm, f"{n}.branch2_0", 384, 1536, 1),
                "b2_1": _bc(wm, f"{n}.branch2_1", 448, 384, 3, 1),
                "b2_2": _bc(wm, f"{n}.branch2_2", 512, 448, 1, 3),
                "b2_3a": _bc(wm, f"{n}.branch2_3a", 256, 512, 1, 3),
                "b2_3b": _bc(wm, f"{n}.branch2_3b", 256, 512, 3, 1),
                "b3": _bc(wm, f"{n}.branch3.1", 256, 1536, 1)}
    p["fc"] = wm.linear("last_linear", cfg.num_classes, 1536)
    return p


def _inception_a(p, x):
    b0 = _a(p["b0"], x)
    b1 = _a(p["b1"][1], _a(p["b1"][0], x), pad=(1, 1))
    b2 = _a(p["b2"][0], x)
    b2 = _a(p["b2"][1], b2, pad=(1, 1))
    b2 = _a(p["b2"][2], b2, pad=(1, 1))
    b3 = _a(p["b3"], _avg3(x))
    return jnp.concatenate([b0, b1, b2, b3], -1)


def _inception_b(p, x):
    b0 = _a(p["b0"], x)
    b1 = _a(p["b1"][0], x)
    b1 = _a(p["b1"][1], b1, pad=(0, 3))
    b1 = _a(p["b1"][2], b1, pad=(3, 0))
    b2 = _a(p["b2"][0], x)
    b2 = _a(p["b2"][1], b2, pad=(3, 0))
    b2 = _a(p["b2"][2], b2, pad=(0, 3))
    b2 = _a(p["b2"][3], b2, pad=(3, 0))
    b2 = _a(p["b2"][4], b2, pad=(0, 3))
    b3 = _a(p["b3"], _avg3(x))
    return jnp.concatenate([b0, b1, b2, b3], -1)


def _inception_c(p, x):
    b0 = _a(p["b0"], x)
    b1 = _a(p["b1_0"], x)
    b1 = jnp.concatenate([_a(p["b1_1a"], b1, pad=(0, 1)),
                          _a(p["b1_1b"], b1, pad=(1, 0))], -1)
    b2 = _a(p["b2_0"], x)
    b2 = _a(p["b2_1"], b2, pad=(1, 0))
    b2 = _a(p["b2_2"], b2, pad=(0, 1))
    b2 = jnp.concatenate([_a(p["b2_3a"], b2, pad=(0, 1)),
                          _a(p["b2_3b"], b2, pad=(1, 0))], -1)
    b3 = _a(p["b3"], _avg3(x))
    return jnp.concatenate([b0, b1, b2, b3], -1)


def apply(params, x, cfg: Inceptionv4Cfg):
    y = _a(params["s0"], x, stride=2)
    y = _a(params["s1"], y)
    y = _a(params["s2"], y, pad=(1, 1))
    # mixed_3a: maxpool ‖ conv s2
    y = jnp.concatenate([nn.max_pool(y, 3, 2),
                         _a(params["m3a"], y, stride=2)], -1)
    # mixed_4a
    b0 = _a(params["m4a_b0"][0], y)
    b0 = _a(params["m4a_b0"][1], b0)
    b1 = _a(params["m4a_b1"][0], y)
    b1 = _a(params["m4a_b1"][1], b1, pad=(0, 3))
    b1 = _a(params["m4a_b1"][2], b1, pad=(3, 0))
    b1 = _a(params["m4a_b1"][3], b1)
    y = jnp.concatenate([b0, b1], -1)
    # mixed_5a: conv s2 ‖ maxpool
    y = jnp.concatenate([_a(params["m5a"], y, stride=2),
                         nn.max_pool(y, 3, 2)], -1)
    for i in range(6, 10):
        y = _inception_a(params[f"features.{i}"], y)
    ra = params["red_a"]
    b1 = _a(ra["b1"][0], y)
    b1 = _a(ra["b1"][1], b1, pad=(1, 1))
    b1 = _a(ra["b1"][2], b1, stride=2)
    y = jnp.concatenate([_a(ra["b0"], y, stride=2), b1,
                         nn.max_pool(y, 3, 2)], -1)
    for i in range(11, 18):
        y = _inception_b(params[f"features.{i}"], y)
    rb = params["red_b"]
    b0 = _a(rb["b0"][1], _a(rb["b0"][0], y), stride=2)
    b1 = _a(rb["b1"][0], y)
    b1 = _a(rb["b1"][1], b1, pad=(0, 3))
    b1 = _a(rb["b1"][2], b1, pad=(3, 0))
    b1 = _a(rb["b1"][3], b1, stride=2)
    y = jnp.concatenate([b0, b1, nn.max_pool(y, 3, 2)], -1)
    for i in range(19, 22):
        y = _inception_c(params[f"features.{i}"], y)
    y = jnp.mean(y, axis=(1, 2))
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="inceptionv4",
    build_params=build_params,
    apply=apply,
    default_cfg=Inceptionv4Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Inception-v4 (reference: inception/inceptionv4/)",
))
