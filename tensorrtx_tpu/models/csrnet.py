"""CSRNet crowd counting (reference: csrnet/csrnet.cpp — VGG16 frontend
(10 convs, 3 pools) + dilated (rate 2) backend + 1×1 density head; crowd
count = density-map sum)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# frontend conv layer indices in the torch Sequential and channels
_FRONT = [(0, 64, 3), (2, 64, 64), (5, 128, 64), (7, 128, 128),
          (10, 256, 128), (12, 256, 256), (14, 256, 256),
          (17, 512, 256), (19, 512, 512), (21, 512, 512)]
_POOL_AFTER = {1, 3, 6}  # after these positions in _FRONT
_BACK = [(0, 512, 512), (2, 512, 512), (4, 512, 512), (6, 256, 512),
         (8, 128, 256), (10, 64, 128)]


@dataclasses.dataclass
class CsrnetCfg:
    input_h: int = 480
    input_w: int = 640


def build_params(wm, cfg: CsrnetCfg):
    return {
        "front": [wm.conv2d(f"frontend.{i}", co, ci, (3, 3)) for i, co, ci in _FRONT],
        "back": [wm.conv2d(f"backend.{i}", co, ci, (3, 3)) for i, co, ci in _BACK],
        "out": wm.conv2d("output_layer", 1, 64, (1, 1)),
    }


def apply(params, x, cfg: CsrnetCfg):
    y = x
    for i, cp in enumerate(params["front"]):
        y = jax.nn.relu(nn.conv2d(y, cp["w"], cp["b"], padding=1))
        if i in _POOL_AFTER:
            y = nn.max_pool(y, 2, 2)
    for cp in params["back"]:
        y = jax.nn.relu(nn.conv2d(y, cp["w"], cp["b"], padding=2, dilation=2))
    return nn.conv2d(y, params["out"]["w"], params["out"]["b"])


def count(density_map) -> float:
    """Crowd count = Σ density (csrnet driver semantics)."""
    import numpy as np

    return float(np.asarray(density_map).sum())


register(ModelDef(
    name="csrnet",
    build_params=build_params,
    apply=apply,
    default_cfg=CsrnetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="CSRNet crowd counting (reference: csrnet/)",
))
