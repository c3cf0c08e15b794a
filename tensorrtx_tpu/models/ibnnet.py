"""IBN-Net: resnet50-ibn-a (reference: ibnnet/ — XingangPan/IBN-Net).

IBN-a replaces the first BN of each bottleneck in layers 1–3 with a split
norm: first half channels InstanceNorm (`bn1.IN`), second half BatchNorm
(`bn1.BN`). The instance norm cannot fold into the conv (input-dependent
stats), so it runs as ops.nn.instance_norm at inference.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5
LAYERS = (3, 4, 6, 3)


@dataclasses.dataclass
class IbnNetCfg:
    variant: str = "a"
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _bn(wm, name, ch):
    g = wm.vec(f"{name}.weight", ch)
    b = wm.vec(f"{name}.bias", ch)
    m = wm.vec(f"{name}.running_mean", ch)
    v = wm.vec(f"{name}.running_var", ch)
    s = g / np.sqrt(v + BN_EPS)
    return {"s": s, "b": b - m * s}


# ibn-b: blocks with a post-residual InstanceNorm (ibnnet.cpp:44 — global
# block indices 2 (layer1.2) and 6 (layer2.3))
_B_IN_BLOCKS = {(0, 2), (1, 3)}


def build_params(wm, cfg: IbnNetCfg):
    assert cfg.variant in ("a", "b")
    if cfg.variant == "b":
        # stem BN is an InstanceNorm in ibn-b (ibnnet.cpp:57-59)
        p = {"stem": {"w": np.transpose(
            wm.tensor("conv1.weight", (64, 3, 7, 7)), (2, 3, 1, 0)),
            "b": None},
            "stem_in_g": wm.vec("bn1.weight", 64),
            "stem_in_b": wm.vec("bn1.bias", 64)}
    else:
        p = {"stem": wm.conv_bn("conv1", "bn1", 64, 3, (7, 7), eps=BN_EPS)}
    in_c = 64
    stages = []
    for li, n in enumerate(LAYERS):
        base = 64 * (2 ** li)
        out_c = base * 4
        blocks = []
        for bi in range(n):
            name = f"layer{li + 1}.{bi}"
            ibn = cfg.variant == "a" and li < 3  # IBN-a split on bn1
            bp = {"c1": wm.conv2d(f"{name}.conv1", base, in_c, (1, 1), bias=False)}
            if ibn:
                half = base // 2
                bp["in_g"] = wm.vec(f"{name}.bn1.IN.weight", half)
                bp["in_b"] = wm.vec(f"{name}.bn1.IN.bias", half)
                bp["bn1"] = _bn(wm, f"{name}.bn1.BN", half)
            else:
                bp["bn1"] = _bn(wm, f"{name}.bn1", base)
            bp["c2"] = wm.conv_bn(f"{name}.conv2", f"{name}.bn2", base, base,
                                  (3, 3), eps=BN_EPS)
            bp["c3"] = wm.conv_bn(f"{name}.conv3", f"{name}.bn3", out_c, base,
                                  (1, 1), eps=BN_EPS)
            if bi == 0:
                bp["down"] = wm.conv_bn(f"{name}.downsample.0",
                                        f"{name}.downsample.1", out_c, in_c,
                                        (1, 1), eps=BN_EPS)
            if cfg.variant == "b" and (li, bi) in _B_IN_BLOCKS:
                bp["post_in_g"] = wm.vec(f"{name}.IN.weight", out_c)
                bp["post_in_b"] = wm.vec(f"{name}.IN.bias", out_c)
            blocks.append(bp)
            in_c = out_c
        stages.append(blocks)
    p["stages"] = stages
    p["fc"] = wm.linear("fc", cfg.num_classes, 2048)
    return p


def apply(params, x, cfg: IbnNetCfg):
    y = nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2,
                  padding=3)
    if "stem_in_g" in params:
        y = nn.instance_norm(y, params["stem_in_g"], params["stem_in_b"])
    y = jax.nn.relu(y)
    y = nn.max_pool(y, 3, 2, 1)
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            z = nn.conv2d(y, bp["c1"]["w"], None)
            if "in_g" in bp:
                half = bp["in_g"].shape[0]
                zi = nn.instance_norm(z[..., :half], bp["in_g"], bp["in_b"])
                zb = (z[..., half:] * bp["bn1"]["s"].astype(z.dtype)
                      + bp["bn1"]["b"].astype(z.dtype))
                z = jnp.concatenate([zi, zb], axis=-1)
            else:
                z = z * bp["bn1"]["s"].astype(z.dtype) + bp["bn1"]["b"].astype(z.dtype)
            z = jax.nn.relu(z)
            z = jax.nn.relu(nn.conv2d(z, bp["c2"]["w"], bp["c2"]["b"],
                                      stride=s, padding=1))
            z = nn.conv2d(z, bp["c3"]["w"], bp["c3"]["b"])
            sc = y if "down" not in bp else nn.conv2d(y, bp["down"]["w"],
                                                      bp["down"]["b"], stride=s)
            y = z + sc
            if "post_in_g" in bp:  # ibn-b post-residual IN (layers.cpp:199)
                y = nn.instance_norm(y, bp["post_in_g"], bp["post_in_b"])
            y = jax.nn.relu(y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["fc"]["w"], params["fc"]["b"])


register(ModelDef(
    name="ibnnet",
    build_params=build_params,
    apply=apply,
    default_cfg=IbnNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ResNet50-IBN-a (reference: ibnnet/)",
))
