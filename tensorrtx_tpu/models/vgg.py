"""VGG-11 (reference: vgg/vgg11.cpp; torchvision vgg11 state_dict)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# torchvision vgg11 features: conv idx → (out, in)
_CONVS = [(0, 64, 3), (3, 128, 64), (6, 256, 128), (8, 256, 256),
          (11, 512, 256), (13, 512, 512), (16, 512, 512), (18, 512, 512)]
_POOL_AFTER = {0, 1, 3, 5, 7}  # pool after these conv positions


@dataclasses.dataclass
class VggCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def build_params(wm, cfg: VggCfg):
    return {
        "convs": [wm.conv2d(f"features.{i}", o, c, (3, 3)) for i, o, c in _CONVS],
        "fc1": wm.linear("classifier.0", 4096, 512 * 7 * 7),
        "fc2": wm.linear("classifier.3", 4096, 4096),
        "fc3": wm.linear("classifier.6", cfg.num_classes, 4096),
    }


def apply(params, x, cfg: VggCfg):
    for i, cp in enumerate(params["convs"]):
        x = jax.nn.relu(nn.conv2d(x, cp["w"], cp["b"], padding=1))
        if i in _POOL_AFTER:
            x = nn.max_pool(x, 2, 2)
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    x = jax.nn.relu(nn.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    x = jax.nn.relu(nn.linear(x, params["fc2"]["w"], params["fc2"]["b"]))
    return nn.linear(x, params["fc3"]["w"], params["fc3"]["b"])


register(ModelDef(
    name="vgg",
    build_params=build_params,
    apply=apply,
    default_cfg=VggCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="VGG-11 (reference: vgg/)",
))
