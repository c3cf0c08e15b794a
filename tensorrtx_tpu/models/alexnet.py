"""AlexNet (reference: alexnet/alexnet.cc, gen_wts.py exports torchvision
alexnet). Weight names: features.{0,3,6,8,10}, classifier.{1,4,6}."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class AlexNetCfg:
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


_FEATS = [  # (layer_idx, out, in, k, stride, pad)
    (0, 64, 3, 11, 4, 2),
    (3, 192, 64, 5, 1, 2),
    (6, 384, 192, 3, 1, 1),
    (8, 256, 384, 3, 1, 1),
    (10, 256, 256, 3, 1, 1),
]


def build_params(wm, cfg: AlexNetCfg):
    p = {"features": [wm.conv2d(f"features.{i}", o, c, (k, k))
                      for i, o, c, k, s, pd in _FEATS]}
    p["fc1"] = wm.linear("classifier.1", 4096, 256 * 6 * 6)
    p["fc2"] = wm.linear("classifier.4", 4096, 4096)
    p["fc3"] = wm.linear("classifier.6", cfg.num_classes, 4096)
    return p


def apply(params, x, cfg: AlexNetCfg):
    pool_after = {0, 1, 4}
    for i, ((li, o, c, k, s, pd), cp) in enumerate(zip(_FEATS, params["features"])):
        x = jax.nn.relu(nn.conv2d(x, cp["w"], cp["b"], stride=s, padding=pd))
        if i in pool_after:
            x = nn.max_pool(x, 3, 2)
    # adaptive avg pool to 6x6 (input 224 → already 6x6; pass through mean if larger)
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)  # CHW-major flatten
    x = jax.nn.relu(nn.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    x = jax.nn.relu(nn.linear(x, params["fc2"]["w"], params["fc2"]["b"]))
    return nn.linear(x, params["fc3"]["w"], params["fc3"]["b"])


register(ModelDef(
    name="alexnet",
    build_params=build_params,
    apply=apply,
    default_cfg=AlexNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="AlexNet (reference: alexnet/)",
))
