"""MnasNet (reference: mnasnet/ — torchvision mnasnet0_5/0_75/1_0/1_3:
sequential `layers.0..16` stem + 6 inverted-residual stacks, classifier.1)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5  # torchvision mnasnet uses momentum tweak, eps default

_DEPTH_BASE = [32, 16, 24, 40, 80, 96, 192, 320]
# stacks: (kernel, stride, expansion, repeats) between depths[i+1]→depths[i+2]
_STACKS = [(3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3), (3, 1, 6, 2),
           (5, 2, 6, 4), (3, 1, 6, 1)]


def _round8(v):
    new = max(8, int(v + 4) // 8 * 8)
    if new < 0.9 * v:
        new += 8
    return new


def _depths(alpha):
    return [_round8(d * alpha) for d in _DEPTH_BASE]


@dataclasses.dataclass
class MnasNetCfg:
    alpha: float = 0.5
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _cbn(wm, ci_name, bn_name, co, ci, k, groups=1):
    return wm.conv_bn(ci_name, bn_name, co, ci, (k, k), groups=groups, eps=BN_EPS)


def build_params(wm, cfg: MnasNetCfg):
    d = _depths(cfg.alpha)
    p = {
        "stem": _cbn(wm, "layers.0", "layers.1", d[0], 3, 3),
        "dw": _cbn(wm, "layers.3", "layers.4", d[0], d[0], 3, groups=d[0]),
        "pw": _cbn(wm, "layers.6", "layers.7", d[1], d[0], 1),
    }
    stacks = []
    cin = d[1]
    for si, (k, s, e, r) in enumerate(_STACKS):
        cout = d[si + 2]
        blocks = []
        for bi in range(r):
            name = f"layers.{8 + si}.{bi}.layers"
            hid = cin * e
            blocks.append({
                "exp": _cbn(wm, f"{name}.0", f"{name}.1", hid, cin, 1),
                "dw": _cbn(wm, f"{name}.3", f"{name}.4", hid, hid, k, groups=hid),
                "proj": _cbn(wm, f"{name}.6", f"{name}.7", cout, hid, 1),
            })
            cin = cout
        stacks.append(blocks)
    p["stacks"] = stacks
    p["head"] = _cbn(wm, "layers.14", "layers.15", 1280, cin, 1)
    p["fc"] = wm.linear("classifier.1", cfg.num_classes, 1280)
    return p


def apply(params, x, cfg: MnasNetCfg):
    r = jax.nn.relu
    y = r(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2, padding=1))
    g = params["dw"]["w"].shape[3]
    y = r(nn.conv2d(y, params["dw"]["w"], params["dw"]["b"], padding=1, groups=g))
    y = nn.conv2d(y, params["pw"]["w"], params["pw"]["b"])
    for (k, s, e, rep), blocks in zip(_STACKS, params["stacks"]):
        for bi, bp in enumerate(blocks):
            stride = s if bi == 0 else 1
            z = r(nn.conv2d(y, bp["exp"]["w"], bp["exp"]["b"]))
            gg = bp["dw"]["w"].shape[3]
            z = r(nn.conv2d(z, bp["dw"]["w"], bp["dw"]["b"], stride=stride,
                            padding=k // 2, groups=gg))
            z = nn.conv2d(z, bp["proj"]["w"], bp["proj"]["b"])
            y = z + y if (stride == 1 and y.shape[-1] == z.shape[-1]) else z
    y = r(nn.conv2d(y, params["head"]["w"], params["head"]["b"]))
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="mnasnet",
    build_params=build_params,
    apply=apply,
    default_cfg=MnasNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="MnasNet (reference: mnasnet/)",
))
