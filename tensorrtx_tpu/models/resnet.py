"""ResNet family: resnet18/34/50, resnext50_32x4d, wide_resnet50_2.

Reference: resnet/resnet18.cpp, resnet34.cpp, resnet50.cpp:111-160,
resnext50_32x4d.cpp, wide_resnet50.cpp and the python builder
resnet/resnet50.py:141-243. Weight names follow torchvision state_dicts
(conv1, bn1, layer{1-4}.{i}.conv{1-3}/bn{1-3}/downsample.{0,1}, fc),
which is what the reference's gen_wts.py dumps.

TPU design: BN folded into convs, NHWC, single fused program per config.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5  # torchvision BatchNorm default

VARIANTS = {
    # name: (block, layers, groups, width_per_group)
    "resnet18": ("basic", [2, 2, 2, 2], 1, 64),
    "resnet34": ("basic", [3, 4, 6, 3], 1, 64),
    "resnet50": ("bottleneck", [3, 4, 6, 3], 1, 64),
    "resnet101": ("bottleneck", [3, 4, 23, 3], 1, 64),
    "resnet152": ("bottleneck", [3, 8, 36, 3], 1, 64),
    "resnext50_32x4d": ("bottleneck", [3, 4, 6, 3], 32, 4),
    "wide_resnet50_2": ("bottleneck", [3, 4, 6, 3], 1, 128),
}


@dataclasses.dataclass
class ResNetCfg:
    variant: str = "resnet50"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _cbn(wm, conv, bn, co, ci, k, stride_unused=None, groups=1):
    return wm.conv_bn(conv, bn, co, ci, (k, k), groups=groups, eps=BN_EPS)


def build_backbone_params(wm, variant: str, prefix: str = ""):
    """Stem + 4 stages (reusable: detr's `backbone.0.body.`, rcnn, etc.)."""
    block, layers, groups, wpg = VARIANTS[variant]
    expansion = 1 if block == "basic" else 4
    p = {"stem": wm.conv_bn(f"{prefix}conv1", f"{prefix}bn1", 64, 3, (7, 7),
                            eps=BN_EPS)}
    in_c = 64
    stages = []
    for li, n in enumerate(layers):
        base = 64 * (2 ** li)
        width = int(base * (wpg / 64.0)) * groups
        out_c = base * expansion
        blocks = []
        for bi in range(n):
            name = f"{prefix}layer{li + 1}.{bi}"
            bp = {}
            if block == "basic":
                bp["conv1"] = wm.conv_bn(f"{name}.conv1", f"{name}.bn1", base,
                                         in_c if bi == 0 else base, (3, 3), eps=BN_EPS)
                bp["conv2"] = wm.conv_bn(f"{name}.conv2", f"{name}.bn2", base,
                                         base, (3, 3), eps=BN_EPS)
            else:
                cin = in_c if bi == 0 else out_c
                bp["conv1"] = wm.conv_bn(f"{name}.conv1", f"{name}.bn1", width, cin, (1, 1), eps=BN_EPS)
                bp["conv2"] = wm.conv_bn(f"{name}.conv2", f"{name}.bn2", width, width, (3, 3),
                                         groups=groups, eps=BN_EPS)
                bp["conv3"] = wm.conv_bn(f"{name}.conv3", f"{name}.bn3", out_c, width, (1, 1), eps=BN_EPS)
            if bi == 0 and (in_c != out_c or li > 0):
                bp["down"] = wm.conv_bn(f"{name}.downsample.0", f"{name}.downsample.1",
                                        out_c, in_c, (1, 1), eps=BN_EPS)
            blocks.append(bp)
        stages.append(blocks)
        in_c = out_c
    p["stages"] = stages
    return p


def build_params(wm, cfg: ResNetCfg):
    p = build_backbone_params(wm, cfg.variant)
    block, _, _, _ = VARIANTS[cfg.variant]
    expansion = 1 if block == "basic" else 4
    p["fc"] = wm.linear("fc", cfg.num_classes, 512 * expansion)
    return p


def backbone_apply(params, x, variant: str, return_stages=False,
                   stem_s2d=False):
    """Stem + stages; returns final feature map (or all 4 stage outputs).

    stem_s2d: run the 7×7 s2 stem as a 4×4 block conv on the 2×2
    space-to-depth input (ops/nn.conv2d_s2d — numerically identical).
    XLA's batch-1 emitter for the 3-channel strided stem spends more time
    in relayout copies than in the conv (DETR-800: 1.13 of 2.47 ms on
    v5e); the s2d form keeps it a plain wide-K stride-1 conv."""
    block, layers, groups, _ = VARIANTS[variant]
    if stem_s2d:
        # x may arrive pre-shuffled as the (H/2, W/2, 12) s2d tensor (the
        # pixel shuffle is free during host preprocessing; doing it
        # on-device on a 3-channel tensor is a pathological relayout)
        x2 = x if x.shape[-1] == 12 else nn.space_to_depth2(x)
        y = nn.conv2d_s2d(x2,
                          nn.s2d_conv_weights(params["stem"]["w"], padding=3),
                          params["stem"]["b"])
    else:
        y = nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2,
                      padding=3)
    y = jax.nn.relu(y)
    y = nn.max_pool(y, 3, 2, 1)
    outs = []
    for li, blocks in enumerate(params["stages"]):
        y = _stage_a(blocks, y, block, groups, li)
        outs.append(y)
    return outs if return_stages else y


def _stage_a(blocks, y, block, groups, li):
    """One residual stage (shared by backbone_apply and the chain mirror's
    float prefix)."""
    stride = 1 if li == 0 else 2
    for bi, bp in enumerate(blocks):
        s = stride if bi == 0 else 1
        identity = y
        if block == "basic":
            z = jax.nn.relu(nn.conv2d(y, bp["conv1"]["w"], bp["conv1"]["b"],
                                      stride=s, padding=1))
            z = nn.conv2d(z, bp["conv2"]["w"], bp["conv2"]["b"], padding=1)
        else:
            z = jax.nn.relu(nn.conv2d(y, bp["conv1"]["w"], bp["conv1"]["b"]))
            z = jax.nn.relu(nn.conv2d(z, bp["conv2"]["w"], bp["conv2"]["b"],
                                      stride=s, padding=1, groups=groups))
            z = nn.conv2d(z, bp["conv3"]["w"], bp["conv3"]["b"])
        if "down" in bp:
            identity = nn.conv2d(y, bp["down"]["w"], bp["down"]["b"], stride=s)
        y = jax.nn.relu(z + identity)
    return y


def _qstage(ctx, blocks, y, block, li):
    """One residual stage on an int8 chain tensor (ops/qchain.py): every
    conv is int8×int8→int32 with a fused epilogue; the block exit is the
    conv+add+relu fusion (ctx.conv_add) — the structure a TensorRT int8
    ResNet engine builds (resnet/resnet50.cpp bottleneck + the int8
    builder flag path)."""
    stride = 1 if li == 0 else 2
    for bi, bp in enumerate(blocks):
        s = stride if bi == 0 else 1
        identity = y
        if "down" in bp:
            identity = ctx.conv(y, bp["down"]["w"], bp["down"]["b"],
                                act=None, stride=s)
        if block == "basic":
            z = ctx.conv(y, bp["conv1"]["w"], bp["conv1"]["b"], act="relu",
                         stride=s)
            y = ctx.conv_add(z, bp["conv2"]["w"], bp["conv2"]["b"], identity)
        else:
            z = ctx.conv(y, bp["conv1"]["w"], bp["conv1"]["b"], act="relu")
            z = ctx.conv(z, bp["conv2"]["w"], bp["conv2"]["b"], act="relu",
                         stride=s)
            y = ctx.conv_add(z, bp["conv3"]["w"], bp["conv3"]["b"], identity)
    return y


def backbone_chain(ctx, params, x2, variant: str):
    """Int8-resident chain mirror of `backbone_apply(stem_s2d=True)` —
    consumes the 2×2 space-to-depth input, returns the final stage's chain
    tensor. `ctx.enter`: "m3" (the generic hybrid-entry token) leaves the
    stem + layer1 in float — at 400²/200² the C≤64 stages hit XLA's s8
    layout oscillation (PERF.md §INT8) — and chains from layer2 where
    C ≥ 512 fills the int8 tiles; "stem" chains from the first conv."""
    block, layers, groups, _ = VARIANTS[variant]
    assert groups == 1, "chained int8 covers the non-grouped variants"
    w2p = nn.s2d_conv_weights(params["stem"]["w"], padding=3)
    if ctx.enter == "m3":
        y = jax.nn.relu(nn.conv2d_s2d(x2, w2p, params["stem"]["b"]))
        y = nn.max_pool(y, 3, 2, 1)
        y = _stage_a(params["stages"][0], y, block, groups, 0)
        y = ctx.quant_in(y)
        start = 1
    else:
        y = ctx.quant_in(x2)
        w2, (pb, pa) = w2p
        y = ctx.conv(y, w2, params["stem"]["b"], act="relu",
                     pads=((pb, pa), (pb, pa)))
        y = ctx.maxpool(y, 3, stride=2, pad=1)
        y = _qstage(ctx, params["stages"][0], y, block, 0)
        start = 1
    for li in range(start, len(params["stages"])):
        y = _qstage(ctx, params["stages"][li], y, block, li)
    return y


def apply(params, x, cfg: ResNetCfg):
    y = backbone_apply(params, x, cfg.variant)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


def _default_cfg():
    return ResNetCfg()


register(ModelDef(
    name="resnet",
    build_params=build_params,
    apply=apply,
    default_cfg=_default_cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ResNet/ResNeXt/WideResNet classifiers (reference: resnet/)",
))
