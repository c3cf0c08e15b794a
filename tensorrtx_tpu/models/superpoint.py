"""SuperPoint keypoints + descriptors (reference: superpoint/supernet.cpp —
VGG-style encoder conv{1-4}{a,b} with 3 maxpools, detector head
convPa→convPb (65ch "semi") and descriptor head convDa→convDb (256ch
"desc"); raw heads are the engine outputs, softmax/normalize happen in the
upstream demo driver)."""

from __future__ import annotations

import dataclasses

import jax

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class SuperPointCfg:
    input_h: int = 120
    input_w: int = 160


_CONVS = [("conv1a", 64, 1), ("conv1b", 64, 64),
          ("conv2a", 64, 64), ("conv2b", 64, 64),
          ("conv3a", 128, 64), ("conv3b", 128, 128),
          ("conv4a", 128, 128), ("conv4b", 128, 128)]


def build_params(wm, cfg: SuperPointCfg):
    p = {n: wm.conv2d(n, co, ci, (3, 3)) for n, co, ci in _CONVS}
    p["convPa"] = wm.conv2d("convPa", 256, 128, (3, 3))
    p["convPb"] = wm.conv2d("convPb", 65, 256, (1, 1))
    p["convDa"] = wm.conv2d("convDa", 256, 128, (3, 3))
    p["convDb"] = wm.conv2d("convDb", 256, 256, (1, 1))
    return p


def apply(params, x, cfg: SuperPointCfg):
    """x: (B, H, W, 1) grayscale → {'semi': (B,H/8,W/8,65),
    'desc': (B,H/8,W/8,256)}."""
    y = x
    for i, (n, _, _) in enumerate(_CONVS):
        y = jax.nn.relu(nn.conv2d(y, params[n]["w"], params[n]["b"], padding=1))
        if i in (1, 3, 5):
            y = nn.max_pool(y, 2, 2)
    pa = jax.nn.relu(nn.conv2d(y, params["convPa"]["w"], params["convPa"]["b"],
                               padding=1))
    semi = nn.conv2d(pa, params["convPb"]["w"], params["convPb"]["b"])
    da = jax.nn.relu(nn.conv2d(y, params["convDa"]["w"], params["convDa"]["b"],
                               padding=1))
    desc = nn.conv2d(da, params["convDb"]["w"], params["convDb"]["b"])
    return {"semi": semi, "desc": desc}


register(ModelDef(
    name="superpoint",
    build_params=build_params,
    apply=apply,
    default_cfg=SuperPointCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 1),
    doc="SuperPoint keypoints/descriptors (reference: superpoint/)",
))
