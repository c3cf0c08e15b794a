"""MobileNetV3-small (reference: mobilenet/mobilenetv3/mobilenet_v3.py —
xiaolai-sqlai/mobilenetv3 layout: features.N.conv.* inverted residuals with
h-swish and SE (fc.0/fc.2, h-sigmoid gate), conv.0 tail + conv.1 SE,
classifier Linear+BN1d+h-swish ×2).

Note: the reference TRT builder approximates BN with gamma/var and drops the
SE multiply in places; we follow the source PyTorch semantics the weights
were trained with.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5

# (in, out, stride, hidden, k, use_se, use_hs)
SMALL = [
    (16, 16, 2, 16, 3, 1, 0),
    (16, 24, 2, 72, 3, 0, 0),
    (24, 24, 1, 88, 3, 0, 0),
    (24, 40, 2, 96, 5, 1, 1),
    (40, 40, 1, 240, 5, 1, 1),
    (40, 40, 1, 240, 5, 1, 1),
    (40, 48, 1, 120, 5, 1, 1),
    (48, 48, 1, 144, 5, 1, 1),
    (48, 96, 2, 288, 5, 1, 1),
    (96, 96, 1, 576, 5, 1, 1),
    (96, 96, 1, 576, 5, 1, 1),
]


# large (create_engine_large, mobilenet_v3.py:282-338)
LARGE = [
    (16, 16, 1, 16, 3, 0, 0),
    (16, 24, 2, 64, 3, 0, 0),
    (24, 24, 1, 72, 3, 0, 0),
    (24, 40, 2, 72, 5, 1, 0),
    (40, 40, 1, 120, 5, 1, 0),
    (40, 40, 1, 120, 5, 1, 0),
    (40, 80, 2, 240, 3, 0, 1),
    (80, 80, 1, 200, 3, 0, 1),
    (80, 80, 1, 184, 3, 0, 1),
    (80, 80, 1, 184, 3, 0, 1),
    (80, 112, 1, 480, 3, 1, 1),
    (112, 112, 1, 672, 3, 1, 1),
    (112, 160, 1, 672, 5, 1, 1),
    (160, 160, 2, 672, 5, 1, 1),
    (160, 160, 1, 960, 5, 1, 1),
]


@dataclasses.dataclass
class MobileNetV3Cfg:
    variant: str = "small"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224

    @property
    def blocks(self):
        return SMALL if self.variant == "small" else LARGE


def _bn1d(wm, name, ch):
    g = wm.vec(f"{name}.weight", ch)
    b = wm.vec(f"{name}.bias", ch)
    m = wm.vec(f"{name}.running_mean", ch)
    v = wm.vec(f"{name}.running_var", ch)
    s = g / np.sqrt(v + BN_EPS)
    return {"s": s, "b": b - m * s}


def _se_p(wm, name, ch, red):
    return {"fc0": wm.linear(f"{name}.fc.0", red, ch),
            "fc2": wm.linear(f"{name}.fc.2", ch, red)}


def build_params(wm, cfg: MobileNetV3Cfg):
    p = {"stem": wm.conv_bn("features.0.0", "features.0.1", 16, 3, (3, 3),
                            eps=BN_EPS), "blocks": []}
    for i, (cin, cout, s, hid, k, se, hs) in enumerate(cfg.blocks):
        name = f"features.{i + 1}.conv"
        bp = {}
        if cin == hid:  # conv_seq_1: dw → [se] → pw
            bp["dw"] = wm.conv_bn(f"{name}.0", f"{name}.1", hid, hid, (k, k),
                                  groups=hid, eps=BN_EPS)
            if se:
                bp["se"] = _se_p(wm, f"{name}.3", hid, hid // 4)
            bp["pw"] = wm.conv_bn(f"{name}.4", f"{name}.5", cout, hid, (1, 1),
                                  eps=BN_EPS)
        else:  # conv_seq_2: pw-expand → dw → [se] → pw-project
            bp["exp"] = wm.conv_bn(f"{name}.0", f"{name}.1", hid, cin, (1, 1),
                                   eps=BN_EPS)
            bp["dw"] = wm.conv_bn(f"{name}.3", f"{name}.4", hid, hid, (k, k),
                                  groups=hid, eps=BN_EPS)
            if se:
                bp["se"] = _se_p(wm, f"{name}.5", hid, hid // 4)
            bp["pw"] = wm.conv_bn(f"{name}.7", f"{name}.8", cout, hid, (1, 1),
                                  eps=BN_EPS)
        p["blocks"].append(bp)
    tail_c = 576 if cfg.variant == "small" else 960
    last_c = cfg.blocks[-1][1]
    p["tail"] = wm.conv_bn("conv.0.0", "conv.0.1", tail_c, last_c, (1, 1),
                           eps=BN_EPS)
    p["cls0"] = wm.linear("classifier.0", 1280, tail_c)
    p["cls3"] = wm.linear("classifier.3", cfg.num_classes, 1280)
    if cfg.variant == "small":
        p["tail_se"] = _se_p(wm, "conv.1", 576, 144)
        p["cls_bn1"] = _bn1d(wm, "classifier.1", 1280)
        p["cls_bn4"] = _bn1d(wm, "classifier.4", cfg.num_classes)
    return p


def _hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _se_a(sp, x):
    w = nn.global_avg_pool(x)
    w = jax.nn.relu(nn.linear(w, sp["fc0"]["w"], sp["fc0"]["b"]))
    w = nn.linear(w, sp["fc2"]["w"], sp["fc2"]["b"])
    gate = jnp.clip(w + 3.0, 0.0, 6.0) / 6.0
    return x * gate[:, None, None, :]


def apply(params, x, cfg: MobileNetV3Cfg):
    y = _hswish(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"],
                          stride=2, padding=1))
    for (cin, cout, s, hid, k, se, hs), bp in zip(cfg.blocks,
                                                  params["blocks"]):
        act = _hswish if hs else jax.nn.relu
        inp = y
        if "exp" in bp:
            y = act(nn.conv2d(y, bp["exp"]["w"], bp["exp"]["b"]))
        g = bp["dw"]["w"].shape[3]
        y = nn.conv2d(y, bp["dw"]["w"], bp["dw"]["b"], stride=s,
                      padding=(k - 1) // 2, groups=g)
        if "exp" not in bp:
            y = act(y)
            if "se" in bp:
                y = _se_a(bp["se"], y)
        else:
            if "se" in bp:
                y = _se_a(bp["se"], y)
            y = act(y)
        y = nn.conv2d(y, bp["pw"]["w"], bp["pw"]["b"])
        if s == 1 and cin == cout:
            y = y + inp
    y = _hswish(nn.conv2d(y, params["tail"]["w"], params["tail"]["b"]))
    if cfg.variant == "small":
        y = _se_a(params["tail_se"], y)
        y = _hswish(nn.global_avg_pool(y))
        y = nn.linear(y, params["cls0"]["w"], params["cls0"]["b"])
        y = _hswish(y * params["cls_bn1"]["s"] + params["cls_bn1"]["b"])
        y = nn.linear(y, params["cls3"]["w"], params["cls3"]["b"])
        return _hswish(y * params["cls_bn4"]["s"] + params["cls_bn4"]["b"])
    # large (mobilenet_v3.py:307-327): pool → hswish → fc → hswish → fc
    y = _hswish(nn.global_avg_pool(y))
    y = _hswish(nn.linear(y, params["cls0"]["w"], params["cls0"]["b"]))
    return nn.linear(y, params["cls3"]["w"], params["cls3"]["b"])


register(ModelDef(
    name="mobilenetv3",
    build_params=build_params,
    apply=apply,
    default_cfg=MobileNetV3Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="MobileNetV3-small (reference: mobilenet/mobilenetv3/)",
))
