"""GhostNet v1 (reference: ghostnet/ghostnetv1/ghostnetv1.cpp — huawei-noah
GhostNet: ghost modules (primary 1×1 conv + cheap depthwise, concat+slice),
ghost bottlenecks with optional dw-stride and hard-sigmoid SE, conv head).
Weight names: conv_stem/bn1, blocks.S.I.{ghost1,ghost2,conv_dw,bn_dw,se,
shortcut}, blocks.9.0 ConvBnAct, conv_head, classifier."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5

# (lname, in, mid, out, k_dw, stride, se_ratio)
CFG = [
    ("blocks.0.0", 16, 16, 16, 3, 1, 0.0),
    ("blocks.1.0", 16, 48, 24, 3, 2, 0.0),
    ("blocks.2.0", 24, 72, 24, 3, 1, 0.0),
    ("blocks.3.0", 24, 72, 40, 5, 2, 0.25),
    ("blocks.4.0", 40, 120, 40, 5, 1, 0.25),
    ("blocks.5.0", 40, 240, 80, 3, 2, 0.0),
    ("blocks.6.0", 80, 200, 80, 3, 1, 0.0),
    ("blocks.6.1", 80, 184, 80, 3, 1, 0.0),
    ("blocks.6.2", 80, 184, 80, 3, 1, 0.0),
    ("blocks.6.3", 80, 480, 112, 3, 1, 0.25),
    ("blocks.6.4", 112, 672, 112, 3, 1, 0.25),
    ("blocks.7.0", 112, 672, 160, 5, 2, 0.25),
    ("blocks.8.0", 160, 960, 160, 5, 1, 0.0),
    ("blocks.8.1", 160, 960, 160, 5, 1, 0.25),
    ("blocks.8.2", 160, 960, 160, 5, 1, 0.0),
    ("blocks.8.3", 160, 960, 160, 5, 1, 0.25),
]


def _divisible(v, d=4):
    new = max(d, int(v + d / 2) // d * d)
    if new < 0.9 * v:
        new += d
    return new


@dataclasses.dataclass
class GhostNetCfg:
    variant: str = "v1"          # v1 | v2 (DFC attention from block 2 on)
    num_classes: int = 1000
    input_h: int = 256
    input_w: int = 320


def _ghost_p(wm, name, inp, oup, relu=True):
    init = math.ceil(oup / 2)
    new = init
    return {
        "p": wm.conv_bn(f"{name}.primary_conv.0", f"{name}.primary_conv.1",
                        init, inp, (1, 1), eps=BN_EPS),
        "c": wm.conv_bn(f"{name}.cheap_operation.0", f"{name}.cheap_operation.1",
                        new, init, (3, 3), groups=init, eps=BN_EPS),
    }


def _short_conv_p(wm, name, inp, oup):
    """GhostNetV2 DFC attention branch (ghostnetv2.cpp:265-318):
    1x1 conv-bn → (1,5) dw conv-bn → (5,1) dw conv-bn."""
    return {
        "c0": wm.conv_bn(f"{name}.short_conv.0", f"{name}.short_conv.1",
                         oup, inp, (1, 1), eps=BN_EPS),
        "c1": wm.conv_bn(f"{name}.short_conv.2", f"{name}.short_conv.3",
                         oup, oup, (1, 5), groups=oup, eps=BN_EPS),
        "c2": wm.conv_bn(f"{name}.short_conv.4", f"{name}.short_conv.5",
                         oup, oup, (5, 1), groups=oup, eps=BN_EPS),
    }


def build_params(wm, cfg: GhostNetCfg):
    p = {"stem": wm.conv_bn("conv_stem", "bn1", 16, 3, (3, 3), eps=BN_EPS),
         "blocks": []}
    for layer_id, (name, inp, mid, oup, k, s, se) in enumerate(CFG):
        bp = {
            "g1": _ghost_p(wm, f"{name}.ghost1", inp, mid),
            "g2": _ghost_p(wm, f"{name}.ghost2", mid, oup, relu=False),
        }
        if cfg.variant == "v2" and layer_id > 1:
            bp["attn"] = _short_conv_p(wm, f"{name}.ghost1", inp, mid)
        if s > 1:
            bp["dw"] = wm.conv_bn(f"{name}.conv_dw", f"{name}.bn_dw", mid, mid,
                                  (k, k), groups=mid, eps=BN_EPS)
        if se > 0:
            red = _divisible(int(mid * se))
            bp["se_r"] = wm.conv2d(f"{name}.se.conv_reduce", red, mid, (1, 1))
            bp["se_e"] = wm.conv2d(f"{name}.se.conv_expand", mid, red, (1, 1))
        if not (inp == oup and s == 1):
            bp["sc_dw"] = wm.conv_bn(f"{name}.shortcut.0", f"{name}.shortcut.1",
                                     inp, inp, (k, k), groups=inp, eps=BN_EPS)
            bp["sc_pw"] = wm.conv_bn(f"{name}.shortcut.2", f"{name}.shortcut.3",
                                     oup, inp, (1, 1), eps=BN_EPS)
        p["blocks"].append(bp)
    p["final"] = wm.conv_bn("blocks.9.0.conv", "blocks.9.0.bn1", 960, 160,
                            (1, 1), eps=BN_EPS)
    p["head"] = wm.conv2d("conv_head", 1280, 960, (1, 1))
    p["fc"] = wm.linear("classifier", cfg.num_classes, 1280)
    return p


def _ghost_a(gp, x, relu=True):
    y1 = nn.conv2d(x, gp["p"]["w"], gp["p"]["b"])
    if relu:
        y1 = jax.nn.relu(y1)
    g = gp["c"]["w"].shape[3]
    y2 = nn.conv2d(y1, gp["c"]["w"], gp["c"]["b"], padding=1, groups=g)
    if relu:
        y2 = jax.nn.relu(y2)
    return jnp.concatenate([y1, y2], axis=-1)


def apply(params, x, cfg: GhostNetCfg):
    y = jax.nn.relu(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"],
                              stride=2, padding=1))
    for (name, inp, mid, oup, k, s, se), bp in zip(CFG, params["blocks"]):
        z = _ghost_a(bp["g1"], y)
        if "attn" in bp:
            # DFC gate: avgpool2 → 1x1 → (1,5) dw → (5,1) dw → sigmoid →
            # nearest-upsample → multiply (ghostnetv2.cpp:265-318)
            ap = bp["attn"]
            g_in = nn.avg_pool(y, 2, 2)
            g = nn.conv2d(g_in, ap["c0"]["w"], ap["c0"]["b"])
            g = nn.conv2d(g, ap["c1"]["w"], ap["c1"]["b"], padding=(0, 2),
                          groups=g.shape[-1])
            g = nn.conv2d(g, ap["c2"]["w"], ap["c2"]["b"], padding=(2, 0),
                          groups=g.shape[-1])
            g = jax.nn.sigmoid(g)
            g = jax.image.resize(g, z.shape, method="nearest")
            z = z * g
        if "dw" in bp:
            g = bp["dw"]["w"].shape[3]
            z = nn.conv2d(z, bp["dw"]["w"], bp["dw"]["b"], stride=s,
                          padding=(k - 1) // 2, groups=g)
        if "se_r" in bp:
            w_ = nn.global_avg_pool(z, keepdims=True)
            w_ = jax.nn.relu(nn.conv2d(w_, bp["se_r"]["w"], bp["se_r"]["b"]))
            w_ = nn.conv2d(w_, bp["se_e"]["w"], bp["se_e"]["b"])
            z = z * nn.hardsigmoid(w_)
        z = _ghost_a(bp["g2"], z, relu=False)
        if "sc_dw" in bp:
            g = bp["sc_dw"]["w"].shape[3]
            sc = nn.conv2d(y, bp["sc_dw"]["w"], bp["sc_dw"]["b"], stride=s,
                           padding=(k - 1) // 2, groups=g)
            sc = nn.conv2d(sc, bp["sc_pw"]["w"], bp["sc_pw"]["b"])
        else:
            sc = y
        y = z + sc
    y = jax.nn.relu(nn.conv2d(y, params["final"]["w"], params["final"]["b"]))
    y = nn.global_avg_pool(y, keepdims=True)
    y = jax.nn.relu(nn.conv2d(y, params["head"]["w"], params["head"]["b"]))
    return nn.linear(y[:, 0, 0], params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="ghostnet",
    build_params=build_params,
    apply=apply,
    default_cfg=GhostNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="GhostNet v1 (reference: ghostnet/ghostnetv1/)",
))

register(ModelDef(
    name="ghostnetv2",
    build_params=build_params,
    apply=apply,
    default_cfg=lambda: GhostNetCfg(variant="v2", input_h=224, input_w=224),
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="GhostNet v2 with DFC attention (reference: ghostnet/ghostnetv2/)",
))
