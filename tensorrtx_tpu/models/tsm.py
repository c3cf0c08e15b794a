"""TSM (Temporal Shift Module) action recognition, R50 backbone.

Reference: tsm/tsm_r50.cpp (+ tsm_r50.py, and tsm/test_shift.py — the
reference repo's only true unit test). Temporal shift: within each video
clip of T segments, the first C/8 channels shift forward in time, the next
C/8 backward, zero-padded at clip boundaries; inserted before conv1 of every
bottleneck's residual branch. Weights = torchvision resnet50 names (the
mmaction2 checkpoint maps onto them).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.resnet import ResNetCfg, VARIANTS, build_backbone_params
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class TsmCfg:
    num_segments: int = 8
    num_classes: int = 400
    input_h: int = 224
    input_w: int = 224
    fold_div: int = 8
    shift_all_blocks: bool = True


def temporal_shift(x, num_segments: int, fold_div: int = 8):
    """x: (N*T, H, W, C) → shifted along T (tsm/test_shift.py semantics):
    channels [0, C/f) take the NEXT frame, [C/f, 2C/f) the PREVIOUS frame,
    the rest pass through; zeros beyond clip edges."""
    nt, h, w, c = x.shape
    t = num_segments
    n = nt // t
    fold = c // fold_div
    xv = x.reshape(n, t, h, w, c)
    fwd = jnp.concatenate(
        [xv[:, 1:, :, :, :fold], jnp.zeros_like(xv[:, :1, :, :, :fold])], axis=1)
    bwd = jnp.concatenate(
        [jnp.zeros_like(xv[:, :1, :, :, fold:2 * fold]),
         xv[:, :-1, :, :, fold:2 * fold]], axis=1)
    out = jnp.concatenate([fwd, bwd, xv[..., 2 * fold:]], axis=-1)
    return out.reshape(nt, h, w, c)


def build_params(wm, cfg: TsmCfg):
    p = build_backbone_params(wm, "resnet50")
    p["fc"] = wm.linear("fc", cfg.num_classes, 2048)
    return p


def apply(params, x, cfg: TsmCfg):
    """x: (N*T, H, W, 3) → (N, num_classes) segment-averaged logits."""
    y = nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2, padding=3)
    y = jax.nn.relu(y)
    y = nn.max_pool(y, 3, 2, 1)
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            z = temporal_shift(y, cfg.num_segments, cfg.fold_div)
            z = jax.nn.relu(nn.conv2d(z, bp["conv1"]["w"], bp["conv1"]["b"]))
            z = jax.nn.relu(nn.conv2d(z, bp["conv2"]["w"], bp["conv2"]["b"],
                                      stride=s, padding=1))
            z = nn.conv2d(z, bp["conv3"]["w"], bp["conv3"]["b"])
            sc = y if "down" not in bp else nn.conv2d(y, bp["down"]["w"],
                                                      bp["down"]["b"], stride=s)
            y = jax.nn.relu(z + sc)
    y = nn.global_avg_pool(y)
    logits = nn.linear(y, params["fc"]["w"], params["fc"]["b"])
    nt = x.shape[0]
    n = nt // cfg.num_segments
    return logits.reshape(n, cfg.num_segments, -1).mean(axis=1)


register(ModelDef(
    name="tsm",
    build_params=build_params,
    apply=apply,
    default_cfg=TsmCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="TSM-R50 action recognition (reference: tsm/)",
))
