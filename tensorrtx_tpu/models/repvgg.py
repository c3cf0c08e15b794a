"""RepVGG A0–B3, deploy mode (reference: repvgg/repvgg.cpp — the .wts comes
from the re-parameterized model, so each block is a single fused 3×3 conv
`rbr_reparam` + ReLU; stages stage0..stage4, head gap + linear)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# variant: (num_blocks per stage, width multipliers)
VARIANTS = {
    "a0": ([2, 4, 14, 1], [0.75, 0.75, 0.75, 2.5]),
    "a1": ([2, 4, 14, 1], [1.0, 1.0, 1.0, 2.5]),
    "a2": ([2, 4, 14, 1], [1.5, 1.5, 1.5, 2.75]),
    "b0": ([4, 6, 16, 1], [1.0, 1.0, 1.0, 2.5]),
    "b1": ([4, 6, 16, 1], [2.0, 2.0, 2.0, 4.0]),
    "b2": ([4, 6, 16, 1], [2.5, 2.5, 2.5, 5.0]),
    "b3": ([4, 6, 16, 1], [3.0, 3.0, 3.0, 5.0]),
}


@dataclasses.dataclass
class RepVGGCfg:
    variant: str = "a0"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def build_params(wm, cfg: RepVGGCfg):
    blocks, widths = VARIANTS[cfg.variant]
    in_planes = min(64, int(64 * widths[0]))
    p = {"stage0": wm.conv2d("stage0.rbr_reparam", in_planes, 3, (3, 3))}
    cin = in_planes
    stages = []
    for si, n in enumerate(blocks):
        cout = int(64 * (2 ** si) * widths[si])
        convs = []
        for bi in range(n):
            convs.append(wm.conv2d(f"stage{si + 1}.{bi}.rbr_reparam",
                                   cout, cin, (3, 3)))
            cin = cout
        stages.append(convs)
    p["stages"] = stages
    p["fc"] = wm.linear("linear", cfg.num_classes, cin)
    return p


def apply(params, x, cfg: RepVGGCfg):
    y = jax.nn.relu(nn.conv2d(x, params["stage0"]["w"], params["stage0"]["b"],
                              stride=2, padding=1))
    for convs in params["stages"]:
        for bi, cp in enumerate(convs):
            s = 2 if bi == 0 else 1
            y = jax.nn.relu(nn.conv2d(y, cp["w"], cp["b"], stride=s, padding=1))
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="repvgg",
    build_params=build_params,
    apply=apply,
    default_cfg=RepVGGCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="RepVGG (deploy-fused) classifier (reference: repvgg/)",
))
