"""HRNet semantic segmentation (HRNetV2-W18/32/48, Cityscapes head).

Reference: hrnet/hrnet-semantic-segmentation/hrnet.cpp:23-380
(createEngine: stem, layer1 = 4 bottlenecks, stages with modules
(1, 4, 3) × 4 basic blocks per branch, fuse upsampling is BILINEAR with
align_corners=true — common.hpp netAddUpsampleBi "tips!" — unlike the
classification variant's nearest; head concatenates the four branches
upsampled to 1/4, last_layer Conv1x1(width·15)+BN+ReLU → Conv1x1(classes),
bilinear resize to input, argmax). Width is a CLI arg (18/32/48); 512×1024,
19 classes. Weight naming matches the classification hrnet, so this reuses
models/hrnet.py's generic module builder with a bilinear fuse."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.hrnet import (_basic_p, _bottleneck_p, _bottleneck_a,
                                        _cbn, _cbr, _module_a, _module_p)
from tensorrtx_tpu.ops import nn

MODS = (1, 4, 3)
BLOCKS = (4, 4, 4)


@dataclasses.dataclass
class HRNetSegCfg:
    width: int = 18
    num_classes: int = 19
    input_h: int = 512
    input_w: int = 1024


def _chans(w):
    return ((w, 2 * w), (w, 2 * w, 4 * w), (w, 2 * w, 4 * w, 8 * w))


def build_params(wm, cfg: HRNetSegCfg):
    w = cfg.width
    chans = _chans(w)
    p = {
        "c1": _cbn(wm, "conv1", "bn1", 64, 3, 3),
        "c2": _cbn(wm, "conv2", "bn2", 64, 64, 3),
        "layer1": [_bottleneck_p(wm, "layer1.0", 64, 64, True)]
        + [_bottleneck_p(wm, f"layer1.{i}", 256, 64, False)
           for i in range(1, 4)],
        "trans1": [
            _cbn(wm, "transition1.0.0", "transition1.0.1", chans[0][0], 256, 3),
            _cbn(wm, "transition1.1.0.0", "transition1.1.0.1", chans[0][1],
                 256, 3),
        ],
    }
    for si in range(3):
        p[f"stage{si + 2}"] = [
            _module_p(wm, f"stage{si + 2}.{m}", chans[si], BLOCKS[si])
            for m in range(MODS[si])]
        if si < 2:
            nb = len(chans[si])
            p[f"trans{si + 2}"] = _cbn(
                wm, f"transition{si + 2}.{nb}.0.0",
                f"transition{si + 2}.{nb}.0.1",
                chans[si + 1][nb], chans[si][-1], 3)
    p["last0"] = _cbn(wm, "last_layer.0", "last_layer.1", 15 * w, 15 * w, 1)
    p["last3"] = wm.conv2d("last_layer.3", cfg.num_classes, 15 * w, (1, 1))
    return p


def _up_bi(t, s):
    return nn.upsample_bilinear(t, (t.shape[1] * s, t.shape[2] * s),
                                align_corners=True)


def apply(params, x, cfg: HRNetSegCfg):
    """x: (B, H, W, 3) mean/std-normalized → (B, H, W) int32 class map."""
    y = _cbr(params["c1"], x, stride=2)
    y = _cbr(params["c2"], y, stride=2)
    for bp in params["layer1"]:
        y = _bottleneck_a(bp, y)
    xs = [_cbr(params["trans1"][0], y), _cbr(params["trans1"][1], y, stride=2)]
    for si in range(3):
        for mp in params[f"stage{si + 2}"]:
            xs = _module_a(mp, xs, up=_up_bi)
        if si < 2:
            xs = xs + [_cbr(params[f"trans{si + 2}"], xs[-1], stride=2)]
    cat = jnp.concatenate(
        [xs[0]] + [_up_bi(xs[i], 2 ** i) for i in range(1, 4)], axis=-1)
    y = _cbr(params["last0"], cat)
    y = nn.conv2d(y, params["last3"]["w"], params["last3"]["b"])
    y = nn.upsample_bilinear(y.astype(jnp.float32),
                             (cfg.input_h, cfg.input_w), align_corners=True)
    return jnp.argmax(y, axis=-1).astype(jnp.int32)


register(ModelDef(
    name="hrnet-seg",
    build_params=build_params,
    apply=apply,
    default_cfg=HRNetSegCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="HRNetV2 semantic segmentation (reference: hrnet/hrnet-semantic-segmentation/)",
))
