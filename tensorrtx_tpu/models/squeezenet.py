"""SqueezeNet 1.1 (reference: squeezenet/squeezenet.cpp; torchvision
squeezenet1_1 state_dict: features.0, features.{3,4,6,7,9,10,11,12}.squeeze/
expand1x1/expand3x3, classifier.1)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# fire modules of squeezenet1_1: (feature_idx, in, squeeze, expand)
_FIRES = [(3, 64, 16, 64), (4, 128, 16, 64), (6, 128, 32, 128),
          (7, 256, 32, 128), (9, 256, 48, 192), (10, 384, 48, 192),
          (11, 384, 64, 256), (12, 512, 64, 256)]
_POOL_BEFORE = {3, 6, 9}  # maxpool before these fire modules


@dataclasses.dataclass
class SqueezeNetCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def build_params(wm, cfg: SqueezeNetCfg):
    fires = []
    for idx, cin, sq, ex in _FIRES:
        fires.append({
            "squeeze": wm.conv2d(f"features.{idx}.squeeze", sq, cin, (1, 1)),
            "e1": wm.conv2d(f"features.{idx}.expand1x1", ex, sq, (1, 1)),
            "e3": wm.conv2d(f"features.{idx}.expand3x3", ex, sq, (3, 3)),
        })
    return {
        "stem": wm.conv2d("features.0", 64, 3, (3, 3)),
        "fires": fires,
        "cls": wm.conv2d("classifier.1", cfg.num_classes, 512, (1, 1)),
    }


def apply(params, x, cfg: SqueezeNetCfg):
    x = jax.nn.relu(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2))
    for (idx, *_), fp in zip(_FIRES, params["fires"]):
        if idx in _POOL_BEFORE:
            x = nn.max_pool(x, 3, 2)
        s = jax.nn.relu(nn.conv2d(x, fp["squeeze"]["w"], fp["squeeze"]["b"]))
        e1 = jax.nn.relu(nn.conv2d(s, fp["e1"]["w"], fp["e1"]["b"]))
        e3 = jax.nn.relu(nn.conv2d(s, fp["e3"]["w"], fp["e3"]["b"], padding=1))
        x = jnp.concatenate([e1, e3], axis=-1)
    x = jax.nn.relu(nn.conv2d(x, params["cls"]["w"], params["cls"]["b"]))
    return nn.global_avg_pool(x)


register(ModelDef(
    name="squeezenet",
    build_params=build_params,
    apply=apply,
    default_cfg=SqueezeNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="SqueezeNet 1.1 (reference: squeezenet/)",
))
