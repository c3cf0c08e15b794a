"""SLANeXt wired-table structure recognition (PP-OCRv5 suite).

Reference: ppocrv5/src/model.cpp:2239-2434 (buildSLANeXtWiredModel).

512x512 → 16x16 patch embed (dim 768) + learned pos → 12 windowed/global
ViT blocks (spatial 32, window 14, padded 42) → conv neck (256→256→512 s2)
→ 256-token sequence → GRU attention decoder (dim 512), on-device
lax.while_loop.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.models import _slanet_decoder as D
from tensorrtx_tpu.models import _slanext_vit as V


@dataclasses.dataclass
class SlanextCfg:
    input_h: int = 512
    input_w: int = 512
    max_steps: int = 501


def build_params(wm, cfg: SlanextCfg):
    size = cfg.input_h // 16
    p = {"patch": P.pconv(wm, "conv2d_0", 768, 3, 16),
         "pos": wm.tensor(P.by_prefix(wm, "create_parameter_0.w_0"),
                          (1, size, size, 768)),
         "blocks": V.build_vit_params(wm, size),
         "neck0": P.pconv(wm, "conv2d_1", 256, 768, 1, bias=False),
         "n0_ln": V.ln2d(wm, "create_parameter_25.w_0",
                         "create_parameter_26.w_0", 256),
         "neck1": P.pconv(wm, "conv2d_2", 256, 256, 3, bias=False),
         "n1_ln": V.ln2d(wm, "create_parameter_27.w_0",
                         "create_parameter_28.w_0", 256),
         "neck2": P.pconv(wm, "conv2d_3", 512, 256, 3, bias=False),
         "dec": D.build_decoder_params(
             wm, 512, 512, "linear_48", "linear_49", "linear_50",
             "linear_51", "linear_52", "linear_53", "linear_54")}
    return p


def apply(params, x, cfg: SlanextCfg):
    """x: (1, H, W, 3) imagenet-normalized → (loc, char_logits, length)."""
    size = cfg.input_h // 16
    y = P.conv(x, params["patch"], stride=16)  # (1, s, s, 768)
    y = y + params["pos"].astype(y.dtype)
    y = V.apply_vit(params["blocks"], y, size)
    y = P.conv(y, params["neck0"])
    y = V.apply_ln2d(y, params["n0_ln"])
    y = P.conv(y, params["neck1"], padding=1)
    y = V.apply_ln2d(y, params["n1_ln"])
    y = P.conv(y, params["neck2"], stride=2, padding=1)  # (1, s/2, s/2, 512)
    b, h, w, c = y.shape
    # reference flattens NCHW (model.cpp:2278-2279): tokens ordered by
    # channel-major flatten then transpose → (1, h*w, 512) row-major spatial
    seq = y.reshape(b, h * w, c)
    return D.decode(params["dec"], seq, 512, cfg.max_steps)


def postprocess(outputs, cfg: SlanextCfg):
    loc_buf, char_buf, length = outputs
    loc, probs = D.postprocess(loc_buf, char_buf, length)
    return {"loc": loc, "probs": probs, "ids": probs.argmax(-1)[0].tolist()}


register(ModelDef(
    name="slanext_wired",
    build_params=build_params,
    apply=apply,
    default_cfg=SlanextCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="SLANeXt wired table (reference: ppocrv5/src/model.cpp:2239)",
))
