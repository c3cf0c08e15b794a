"""SE-ResNet50 (reference: senet/se_resnet50.cpp — resnet50 bottlenecks with
a squeeze-excitation branch `se.fc.0/fc.2` (reduction 16) before the residual
add; moskomule/senet.pytorch state_dict naming)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5
LAYERS = (3, 4, 6, 3)


@dataclasses.dataclass
class SENetCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224
    reduction: int = 16


def build_params(wm, cfg: SENetCfg):
    p = {"stem": wm.conv_bn("conv1", "bn1", 64, 3, (7, 7), eps=BN_EPS)}
    in_c = 64
    stages = []
    for li, n in enumerate(LAYERS):
        base = 64 * (2 ** li)
        out_c = base * 4
        blocks = []
        for bi in range(n):
            name = f"layer{li + 1}.{bi}."
            bp = {
                "c1": wm.conv_bn(f"{name}conv1", f"{name}bn1", base, in_c, (1, 1), eps=BN_EPS),
                "c2": wm.conv_bn(f"{name}conv2", f"{name}bn2", base, base, (3, 3), eps=BN_EPS),
                "c3": wm.conv_bn(f"{name}conv3", f"{name}bn3", out_c, base, (1, 1), eps=BN_EPS),
                "se1": wm.linear(f"{name}se.fc.0", out_c // cfg.reduction, out_c),
                "se2": wm.linear(f"{name}se.fc.2", out_c, out_c // cfg.reduction),
            }
            if bi == 0:
                bp["down"] = wm.conv_bn(f"{name}downsample.0", f"{name}downsample.1",
                                        out_c, in_c, (1, 1), eps=BN_EPS)
            blocks.append(bp)
            in_c = out_c
        stages.append(blocks)
    p["stages"] = stages
    p["fc"] = wm.linear("fc", cfg.num_classes, 2048)
    return p


def apply(params, x, cfg: SENetCfg):
    y = jax.nn.relu(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"],
                              stride=2, padding=3))
    y = nn.max_pool(y, 3, 2, 1)
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            z = jax.nn.relu(nn.conv2d(y, bp["c1"]["w"], bp["c1"]["b"]))
            z = jax.nn.relu(nn.conv2d(z, bp["c2"]["w"], bp["c2"]["b"],
                                      stride=s, padding=1))
            z = nn.conv2d(z, bp["c3"]["w"], bp["c3"]["b"])
            # squeeze-excitation (se_resnet50.cpp:111-123)
            w_ = nn.global_avg_pool(z)
            w_ = jax.nn.relu(nn.linear(w_, bp["se1"]["w"], bp["se1"]["b"]))
            w_ = jax.nn.sigmoid(nn.linear(w_, bp["se2"]["w"], bp["se2"]["b"]))
            z = z * w_[:, None, None, :]
            sc = y if "down" not in bp else nn.conv2d(y, bp["down"]["w"],
                                                      bp["down"]["b"], stride=s)
            y = jax.nn.relu(z + sc)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="senet",
    build_params=build_params,
    apply=apply,
    default_cfg=SENetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="SE-ResNet50 (reference: senet/)",
))
