"""MobileNetV2 + MobileNetV3 (reference: mobilenet/mobilenetv2/,
mobilenetv3/; torchvision mobilenet_v2 state_dict and the mbv3 layout the
reference's gen_wts uses).

V2: features.0 ConvBNReLU6, features.1..17 InvertedResidual, features.18
ConvBNReLU6, classifier.1 Linear.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


def relu6(x):
    return jnp.clip(x, 0.0, 6.0)


# torchvision mobilenet_v2 inverted residual setting (t, c, n, s)
_V2_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]


@dataclasses.dataclass
class MobileNetCfg:
    version: str = "v2"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def build_params(wm, cfg: MobileNetCfg):
    assert cfg.version == "v2", "v3 arrives with the hswish catalog pass"
    p = {"stem": wm.conv_bn("features.0.0", "features.0.1", 32, 3, (3, 3), eps=BN_EPS)}
    blocks = []
    cin = 32
    fi = 1
    for t, c, n, s in _V2_SETTING:
        for i in range(n):
            hidden = cin * t
            name = f"features.{fi}.conv"
            entries = {}
            layer = 0
            if t != 1:
                entries["expand"] = wm.conv_bn(f"{name}.0.0", f"{name}.0.1",
                                               hidden, cin, (1, 1), eps=BN_EPS)
                layer = 1
            entries["dw"] = wm.conv_bn(f"{name}.{layer}.0", f"{name}.{layer}.1",
                                       hidden, hidden, (3, 3), groups=hidden, eps=BN_EPS)
            entries["project"] = wm.conv_bn(f"{name}.{layer + 1}", f"{name}.{layer + 2}",
                                            c, hidden, (1, 1), eps=BN_EPS)
            blocks.append(entries)
            cin = c
            fi += 1
    p["blocks"] = blocks
    p["head"] = wm.conv_bn("features.18.0", "features.18.1", 1280, 320, (1, 1), eps=BN_EPS)
    p["fc"] = wm.linear("classifier.1", cfg.num_classes, 1280)
    return p


def apply(params, x, cfg: MobileNetCfg):
    x = relu6(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2, padding=1))
    bi = 0
    for t, c, n, s in _V2_SETTING:
        for i in range(n):
            bp = params["blocks"][bi]
            bi += 1
            stride = s if i == 0 else 1
            y = x
            if "expand" in bp:
                y = relu6(nn.conv2d(y, bp["expand"]["w"], bp["expand"]["b"]))
            g = bp["dw"]["w"].shape[3]
            y = relu6(nn.conv2d(y, bp["dw"]["w"], bp["dw"]["b"], stride=stride,
                                padding=1, groups=g))
            y = nn.conv2d(y, bp["project"]["w"], bp["project"]["b"])
            if stride == 1 and x.shape[-1] == y.shape[-1]:
                y = x + y
            x = y
    x = relu6(nn.conv2d(x, params["head"]["w"], params["head"]["b"]))
    x = nn.global_avg_pool(x)
    return nn.linear(x, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="mobilenetv2",
    build_params=build_params,
    apply=apply,
    default_cfg=MobileNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="MobileNetV2 (reference: mobilenet/mobilenetv2/)",
))
