"""ShuffleNetV2 x0.5–x2.0 (reference: shufflenetv2/shufflenet_v2.cpp;
torchvision shufflenet_v2_x* state_dict). Channel split + channel shuffle
expressed as reshape/transpose (free layout ops under XLA)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5

VARIANTS = {
    "x0_5": ([4, 8, 4], [24, 48, 96, 192, 1024]),
    "x1_0": ([4, 8, 4], [24, 116, 232, 464, 1024]),
    "x1_5": ([4, 8, 4], [24, 176, 352, 704, 1024]),
    "x2_0": ([4, 8, 4], [24, 244, 488, 976, 2048]),
}


@dataclasses.dataclass
class ShuffleNetCfg:
    variant: str = "x1_0"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _cbn(wm, cname, bnname, co, ci, k, groups=1):
    return wm.conv_bn(cname, bnname, co, ci, (k, k), groups=groups, eps=BN_EPS)


def build_params(wm, cfg: ShuffleNetCfg):
    repeats, chans = VARIANTS[cfg.variant]
    p = {
        "conv1": _cbn(wm, "conv1.0", "conv1.1", chans[0], 3, 3),
        "conv5": _cbn(wm, "conv5.0", "conv5.1", chans[4], chans[3], 1),
        "fc": wm.linear("fc", cfg.num_classes, chans[4]),
        "stages": [],
    }
    cin = chans[0]
    for si, n in enumerate(repeats):
        cout = chans[si + 1]
        blocks = []
        for bi in range(n):
            name = f"stage{si + 2}.{bi}"
            half = cout // 2
            bp = {}
            if bi == 0:
                bp["b1_dw"] = _cbn(wm, f"{name}.branch1.0", f"{name}.branch1.1",
                                   cin, cin, 3, groups=cin)
                bp["b1_pw"] = _cbn(wm, f"{name}.branch1.2", f"{name}.branch1.3",
                                   half, cin, 1)
                b2in = cin
            else:
                b2in = half
            bp["b2_pw1"] = _cbn(wm, f"{name}.branch2.0", f"{name}.branch2.1",
                                half, b2in, 1)
            bp["b2_dw"] = _cbn(wm, f"{name}.branch2.3", f"{name}.branch2.4",
                               half, half, 3, groups=half)
            bp["b2_pw2"] = _cbn(wm, f"{name}.branch2.5", f"{name}.branch2.6",
                                half, half, 1)
            blocks.append(bp)
        p["stages"].append(blocks)
        cin = cout
    return p


def channel_shuffle(x, groups=2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.transpose(x, (0, 1, 2, 4, 3))
    return x.reshape(b, h, w, c)


def apply(params, x, cfg: ShuffleNetCfg):
    y = jax.nn.relu(nn.conv2d(x, params["conv1"]["w"], params["conv1"]["b"],
                              stride=2, padding=1))
    y = nn.max_pool(y, 3, 2, 1)
    for blocks in params["stages"]:
        for bi, bp in enumerate(blocks):
            if bi == 0:
                b1 = nn.conv2d(y, bp["b1_dw"]["w"], bp["b1_dw"]["b"], stride=2,
                               padding=1, groups=bp["b1_dw"]["w"].shape[3])
                b1 = jax.nn.relu(nn.conv2d(b1, bp["b1_pw"]["w"], bp["b1_pw"]["b"]))
                b2_in = y
                stride = 2
            else:
                c = y.shape[-1] // 2
                b1, b2_in = y[..., :c], y[..., c:]
                stride = 1
            z = jax.nn.relu(nn.conv2d(b2_in, bp["b2_pw1"]["w"], bp["b2_pw1"]["b"]))
            z = nn.conv2d(z, bp["b2_dw"]["w"], bp["b2_dw"]["b"], stride=stride,
                          padding=1, groups=bp["b2_dw"]["w"].shape[3])
            z = jax.nn.relu(nn.conv2d(z, bp["b2_pw2"]["w"], bp["b2_pw2"]["b"]))
            y = channel_shuffle(jnp.concatenate([b1, z], axis=-1))
    y = jax.nn.relu(nn.conv2d(y, params["conv5"]["w"], params["conv5"]["b"]))
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="shufflenetv2",
    build_params=build_params,
    apply=apply,
    default_cfg=ShuffleNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ShuffleNetV2 (reference: shufflenetv2/)",
))
