"""HRNet classification (W18-small-v2 default) — multi-resolution network.

Reference: hrnet/hrnet-image-classification/hrnet.cpp (a 757-line unrolled
graph, id_993..id_2181) — here a generic HighResolutionModule generator:
stem (2 strided convs) → layer1 (2 bottlenecks) → transitions + stages of
parallel branches with all-to-all fusion (1×1+bn+nearest-upsample going up,
strided 3×3 chains going down) → classification head (incre bottlenecks,
downsample chain, final 1×1 2048, linear). Official HRNet state_dict names.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5

# variant: (stage_modules, stage_channels)
VARIANTS = {
    "w18_small_v2": ((1, 3, 2), ((18, 36), (18, 36, 72), (18, 36, 72, 144)),
                     (2, 2, 2, 2)),
    "w18": ((1, 4, 3), ((18, 36), (18, 36, 72), (18, 36, 72, 144)),
            (4, 4, 4, 4)),
    "w32": ((1, 4, 3), ((32, 64), (32, 64, 128), (32, 64, 128, 256)),
            (4, 4, 4, 4)),
}
HEAD_PLANES = (32, 64, 128, 256)  # incre bottleneck planes (out = ×4)


@dataclasses.dataclass
class HRNetCfg:
    variant: str = "w18_small_v2"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _cbn(wm, cname, bname, co, ci, k):
    return wm.conv_bn(cname, bname, co, ci, (k, k), eps=BN_EPS)


def _basic_p(wm, name, ch):
    return {
        "c1": _cbn(wm, f"{name}.conv1", f"{name}.bn1", ch, ch, 3),
        "c2": _cbn(wm, f"{name}.conv2", f"{name}.bn2", ch, ch, 3),
    }


def _bottleneck_p(wm, name, cin, planes, down):
    p = {
        "c1": _cbn(wm, f"{name}.conv1", f"{name}.bn1", planes, cin, 1),
        "c2": _cbn(wm, f"{name}.conv2", f"{name}.bn2", planes, planes, 3),
        "c3": _cbn(wm, f"{name}.conv3", f"{name}.bn3", planes * 4, planes, 1),
    }
    if down:
        p["down"] = _cbn(wm, f"{name}.downsample.0", f"{name}.downsample.1",
                         planes * 4, cin, 1)
    return p


def _module_p(wm, name, chans, n_blocks):
    nb = len(chans)
    branches = [[_basic_p(wm, f"{name}.branches.{b}.{k}", chans[b])
                 for k in range(n_blocks)] for b in range(nb)]
    fuse = {}
    for i in range(nb):
        for j in range(nb):
            if i == j:
                continue
            if j > i:  # upsample path: 1x1 conv + bn
                fuse[(i, j)] = [_cbn(wm, f"{name}.fuse_layers.{i}.{j}.0",
                                     f"{name}.fuse_layers.{i}.{j}.1",
                                     chans[i], chans[j], 1)]
            else:      # downsample chain of (i-j) strided 3x3 convs
                steps = []
                for k in range(i - j):
                    co = chans[i] if k == i - j - 1 else chans[j]
                    steps.append(_cbn(wm, f"{name}.fuse_layers.{i}.{j}.{k}.0",
                                      f"{name}.fuse_layers.{i}.{j}.{k}.1",
                                      co, chans[j], 3))
                fuse[(i, j)] = steps
    return {"branches": branches,
            "fuse": {f"{i}_{j}": v for (i, j), v in fuse.items()}}


def build_params(wm, cfg: HRNetCfg):
    mods, chans, blocks = VARIANTS[cfg.variant]
    p = {
        "c1": _cbn(wm, "conv1", "bn1", 64, 3, 3),
        "c2": _cbn(wm, "conv2", "bn2", 64, 64, 3),
        "layer1": [_bottleneck_p(wm, "layer1.0", 64, 64, True),
                   _bottleneck_p(wm, "layer1.1", 256, 64, False)],
    }
    # transition1: every branch gets a conv (ch change from 256)
    p["trans1"] = [
        _cbn(wm, "transition1.0.0", "transition1.0.1", chans[0][0], 256, 3),
        _cbn(wm, "transition1.1.0.0", "transition1.1.0.1", chans[0][1], 256, 3),
    ]
    for si in range(3):
        p[f"stage{si + 2}"] = [
            _module_p(wm, f"stage{si + 2}.{m}", chans[si], blocks[si])
            for m in range(mods[si])]
        if si < 2:  # transition to the next stage: only the NEW branch
            nb = len(chans[si])
            p[f"trans{si + 2}"] = _cbn(
                wm, f"transition{si + 2}.{nb}.0.0",
                f"transition{si + 2}.{nb}.0.1",
                chans[si + 1][nb], chans[si][-1], 3)
    p["incre"] = [_bottleneck_p(wm, f"incre_modules.{i}.0", chans[2][i],
                                HEAD_PLANES[i], True) for i in range(4)]
    p["downsamp"] = []
    for i in range(3):
        cin = HEAD_PLANES[i] * 4
        cout = HEAD_PLANES[i + 1] * 4
        p["downsamp"].append({
            "conv": wm.conv2d(f"downsamp_modules.{i}.0", cout, cin, (3, 3)),
            "bn": wm.bn(f"downsamp_modules.{i}.1", cout, BN_EPS),
        })
    p["final"] = {"conv": wm.conv2d("final_layer.0", 2048, 1024, (1, 1)),
                  "bn": wm.bn("final_layer.1", 2048, BN_EPS)}
    p["fc"] = wm.linear("classifier", cfg.num_classes, 2048)
    return p


def _cbr(pp, x, stride=1, relu=True):
    k = pp["w"].shape[0]
    y = nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2)
    return jax.nn.relu(y) if relu else y


def _basic_a(bp, x):
    y = _cbr(bp["c1"], x)
    y = _cbr(bp["c2"], y, relu=False)
    return jax.nn.relu(x + y)


def _bottleneck_a(bp, x, stride=1):
    y = _cbr(bp["c1"], x)
    y = _cbr(bp["c2"], y, stride=stride)
    y = _cbr(bp["c3"], y, relu=False)
    sc = x if "down" not in bp else _cbr(bp["down"], x, stride=stride, relu=False)
    return jax.nn.relu(y + sc)


def _module_a(mp, xs, up=None):
    """up: upsample fn (t, scale) → t; cls uses nearest (this file), the
    seg variant passes bilinear align_corners (hrnet_seg.py)."""
    if up is None:
        up = lambda t, s: nn.upsample_nearest(t, s)
    nb = len(xs)
    ys = []
    for b in range(nb):
        y = xs[b]
        for blk in mp["branches"][b]:
            y = _basic_a(blk, y)
        ys.append(y)
    outs = []
    for i in range(nb):
        acc = ys[i]
        for j in range(nb):
            if i == j:
                continue
            key = f"{i}_{j}"
            if j > i:
                t = _cbr(mp["fuse"][key][0], ys[j], relu=False)
                t = up(t, 2 ** (j - i))
            else:
                t = ys[j]
                steps = mp["fuse"][key]
                for k, st in enumerate(steps):
                    t = _cbr(st, t, stride=2, relu=(k != len(steps) - 1))
            acc = acc + t
        outs.append(jax.nn.relu(acc))
    return outs


def apply(params, x, cfg: HRNetCfg):
    mods, chans, blocks = VARIANTS[cfg.variant]
    y = _cbr(params["c1"], x, stride=2)
    y = _cbr(params["c2"], y, stride=2)
    y = _bottleneck_a(params["layer1"][0], y)
    y = _bottleneck_a(params["layer1"][1], y)
    xs = [_cbr(params["trans1"][0], y), _cbr(params["trans1"][1], y, stride=2)]
    for si in range(3):
        for mp in params[f"stage{si + 2}"]:
            xs = _module_a(mp, xs)
        if si < 2:
            xs = xs + [_cbr(params[f"trans{si + 2}"], xs[-1], stride=2)]
    # classification head (hrnet.cpp:559-577)
    y = _bottleneck_a(params["incre"][0], xs[0])
    for i in range(3):
        z = _bottleneck_a(params["incre"][i + 1], xs[i + 1])
        dp = params["downsamp"][i]
        s, b = dp["bn"]
        d = nn.conv2d(y, dp["conv"]["w"], dp["conv"]["b"], stride=2, padding=1)
        d = jax.nn.relu(d * jnp.asarray(s, d.dtype) + jnp.asarray(b, d.dtype))
        y = z + d
    s, b = params["final"]["bn"]
    y = nn.conv2d(y, params["final"]["conv"]["w"], params["final"]["conv"]["b"])
    y = jax.nn.relu(y * jnp.asarray(s, y.dtype) + jnp.asarray(b, y.dtype))
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="hrnet",
    build_params=build_params,
    apply=apply,
    default_cfg=HRNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="HRNet classification (reference: hrnet/hrnet-image-classification/)",
))
