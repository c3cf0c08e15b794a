"""UVDoc document unwarping (PP-OCRv5 suite).

Reference: ppocrv5/src/model.cpp:1925-1997 (buildUVDocModel) +
src/block.cpp:746-797 (residual/down blocks, reflect pad, scalar PReLU).

800x800 input → align-corners bilinear resize to 712x488 → dilated residual
CNN → 6-branch dilated context → grid head (reflect-pad 5x5 convs, scalar
PReLU) → 2-channel flow grid upsampled to 800x800 → bilinear grid-sample of
the ORIGINAL image (align_corners, zero fill).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.grid_sample import grid_sample_bilinear


@dataclasses.dataclass
class UvdocCfg:
    input_h: int = 800
    input_w: int = 800
    resize_h: int = 712
    resize_w: int = 488


def _cbnr(wm, conv, bn, co, ci, bias):
    # bias convs: addConvBiasBn* (block.cpp:1408-1427); no-bias: :1429-1440
    return P.pconv_bn(wm, f"conv2d_{conv}", f"batch_norm2d_{bn}", co, ci, 5,
                      bias=bias)


def _res_block(wm, ch, c0, b0, c1, b1):
    return {"c0": _cbnr(wm, c0, b0, ch, ch, True),
            "c1": _cbnr(wm, c1, b1, ch, ch, True)}


def _down_block(wm, ch, skip_c, skip_b, c0, b0, c1, b1):
    return {"skip": _cbnr(wm, skip_c, skip_b, ch, ch // 2, True),
            "c0": _cbnr(wm, c0, b0, ch, ch // 2, True),
            "c1": _cbnr(wm, c1, b1, ch, ch, True)}


def build_params(wm, cfg: UvdocCfg):
    p = {"stem0": _cbnr(wm, 0, 0, 32, 3, False),
         "stem1": _cbnr(wm, 1, 1, 32, 32, False)}
    p["c1"] = [_res_block(wm, 32, 2, 2, 3, 3),
               _res_block(wm, 32, 4, 4, 5, 5),
               _res_block(wm, 32, 6, 6, 7, 7)]
    p["d2"] = _down_block(wm, 64, 8, 8, 9, 9, 10, 10)
    p["c2"] = [_res_block(wm, 64, 11, 11, 12, 12),
               _res_block(wm, 64, 13, 13, 14, 14),
               _res_block(wm, 64, 15, 15, 16, 16)]
    p["d3"] = _down_block(wm, 128, 17, 17, 18, 18, 19, 19)
    p["c3"] = [_res_block(wm, 128, 20 + 2 * i, 20 + 2 * i,
                          21 + 2 * i, 21 + 2 * i) for i in range(5)]
    # 6-branch dilated context (model.cpp:1958-1975), all 3x3 no-bias conv+BN
    def ctx(n):
        return P.pconv_bn(wm, f"conv2d_{n}", f"batch_norm2d_{n}", 128, 128, 3)

    p["ctx"] = {str(n): ctx(n) for n in range(30, 42)}
    p["fuse"] = P.pconv_bn(wm, "conv2d_42", "batch_norm2d_42", 128, 768, 1)
    p["head0"] = _cbnr(wm, 43, 43, 32, 128, False)
    p["prelu"] = wm.vec("p_re_lu_0.w_0", 1)
    p["grid"] = P.pconv(wm, "conv2d_44", 2, 32, 5)
    return p


_C1_DIL = (1, 3, 3)
_C2_DIL = (3, 3, 3)
_C3_DIL = (3, 3, 3, 3, 3)
# branch spec: [(conv_idx, dilation), ...]
_CTX = [[(30, 1)], [(31, 2)], [(32, 5)], [(33, 8), (34, 3), (35, 2)],
        [(36, 12), (37, 7), (38, 4)], [(39, 18), (40, 12), (41, 6)]]


def _res(bp, x, dil):
    y = jax.nn.relu(P.conv(x, bp["c0"], padding=dil * 2, dilation=dil))
    y = P.conv(y, bp["c1"], padding=dil * 2, dilation=dil)
    return jax.nn.relu(y + x)


def _down(bp, x):
    skip = P.conv(x, bp["skip"], stride=2, padding=2)
    y = jax.nn.relu(P.conv(x, bp["c0"], stride=2, padding=2))
    y = P.conv(y, bp["c1"], padding=2)
    return jax.nn.relu(y + skip)


def _reflect_pad2(x):
    return jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")


def apply(params, x, cfg: UvdocCfg):
    """x: (B, 800, 800, 3) in [0,1]-scaled RGB → unwarped image, same shape."""
    y = nn.upsample_bilinear(x, (cfg.resize_h, cfg.resize_w),
                             align_corners=True)
    y = jax.nn.relu(P.conv(y, params["stem0"], stride=2, padding=2))
    y = jax.nn.relu(P.conv(y, params["stem1"], stride=2, padding=2))
    for bp, d in zip(params["c1"], _C1_DIL):
        y = _res(bp, y, d)
    y = _down(params["d2"], y)
    for bp, d in zip(params["c2"], _C2_DIL):
        y = _res(bp, y, d)
    y = _down(params["d3"], y)
    for bp, d in zip(params["c3"], _C3_DIL):
        y = _res(bp, y, d)

    branches = []
    for spec in _CTX:
        b = y
        for (n, d) in spec:
            b = jax.nn.relu(P.conv(b, params["ctx"][str(n)], padding=d,
                                   dilation=d))
        branches.append(b)
    ctx = jnp.concatenate(branches, axis=-1)
    f = jax.nn.relu(P.conv(ctx, params["fuse"]))

    h = P.conv(_reflect_pad2(f), params["head0"])
    alpha = params["prelu"].astype(h.dtype)
    h = jnp.where(h > 0, h, h * alpha)
    low = P.conv(_reflect_pad2(h), params["grid"])  # (B, h', w', 2)
    grid = nn.upsample_bilinear(low, (cfg.input_h, cfg.input_w),
                                align_corners=True)
    return grid_sample_bilinear(x, grid, align_corners=True)


register(ModelDef(
    name="uvdoc",
    build_params=build_params,
    apply=apply,
    default_cfg=UvdocCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="UVDoc document unwarping (reference: ppocrv5/src/model.cpp:1925)",
))
