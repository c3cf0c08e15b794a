"""DBNet text detection (ResNet18 + FPN + DB head).

Reference: dbnet/dbnet.cpp:83-240 (+ embedded Clipper for unclip — replaced
by ops/db.py numpy geometry). Weights follow WenmuZhou/DBNet.pytorch naming
(backbone.*, neck.reduce_conv_c{2-5}/smooth_p{2-4}/conv, head.binarize.*).

Note: the reference approximates the FPN ×4 upsample with an overlapping
ones-deconvolution (dbnet.cpp:160-170), which sums 2×2 neighborhoods; we use
exact nearest-neighbor interpolation like the source network.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


@dataclasses.dataclass
class DBNetCfg:
    input_h: int = 640
    input_w: int = 1152
    bin_thresh: float = 0.3
    box_thresh: float = 0.7
    unclip_ratio: float = 1.5


def _cbr(wm, cname, bname, co, ci, k):
    return wm.conv_bn(cname, bname, co, ci, (k, k), eps=BN_EPS)


def _basic(wm, name, cin, cout, down):
    p = {
        "c1": _cbr(wm, f"{name}conv1", f"{name}bn1", cout, cin, 3),
        "c2": _cbr(wm, f"{name}conv2", f"{name}bn2", cout, cout, 3),
    }
    if down:
        p["down"] = _cbr(wm, f"{name}downsample.0", f"{name}downsample.1",
                         cout, cin, 1)
    return p


def build_params(wm, cfg: DBNetCfg):
    p = {"stem": _cbr(wm, "backbone.conv1", "backbone.bn1", 64, 3, 7)}
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    stages = []
    for li, (cin, cout) in enumerate(chans):
        blocks = [_basic(wm, f"backbone.layer{li + 1}.0.", cin, cout, li > 0),
                  _basic(wm, f"backbone.layer{li + 1}.1.", cout, cout, False)]
        stages.append(blocks)
    p["stages"] = stages
    p["red_c5"] = _cbr(wm, "neck.reduce_conv_c5.conv", "neck.reduce_conv_c5.bn", 64, 512, 1)
    p["red_c4"] = _cbr(wm, "neck.reduce_conv_c4.conv", "neck.reduce_conv_c4.bn", 64, 256, 1)
    p["red_c3"] = _cbr(wm, "neck.reduce_conv_c3.conv", "neck.reduce_conv_c3.bn", 64, 128, 1)
    p["red_c2"] = _cbr(wm, "neck.reduce_conv_c2.conv", "neck.reduce_conv_c2.bn", 64, 64, 1)
    p["smooth_p4"] = _cbr(wm, "neck.smooth_p4.conv", "neck.smooth_p4.bn", 64, 64, 3)
    p["smooth_p3"] = _cbr(wm, "neck.smooth_p3.conv", "neck.smooth_p3.bn", 64, 64, 3)
    p["smooth_p2"] = _cbr(wm, "neck.smooth_p2.conv", "neck.smooth_p2.bn", 64, 64, 3)
    p["neck_out"] = _cbr(wm, "neck.conv.0", "neck.conv.1", 256, 256, 3)
    p["bin0"] = _cbr(wm, "head.binarize.0", "head.binarize.1", 64, 256, 3)
    up1 = wm.tensor("head.binarize.3.weight", (64, 64, 2, 2))
    p["bin_up1_w"] = np.transpose(up1, (2, 3, 1, 0))
    p["bin_up1_b"] = wm.vec("head.binarize.3.bias", 64)
    g = wm.vec("head.binarize.4.weight", 64)
    b = wm.vec("head.binarize.4.bias", 64)
    m = wm.vec("head.binarize.4.running_mean", 64)
    v = wm.vec("head.binarize.4.running_var", 64)
    s = g / np.sqrt(v + BN_EPS)
    p["bin_bn"] = {"s": s, "b": b - m * s}
    up2 = wm.tensor("head.binarize.6.weight", (64, 1, 2, 2))
    p["bin_up2_w"] = np.transpose(up2, (2, 3, 1, 0))
    p["bin_up2_b"] = wm.vec("head.binarize.6.bias", 1)
    return p


def _cbr_a(p, x, stride=1):
    k = p["w"].shape[0]
    return jax.nn.relu(nn.conv2d(x, p["w"], p["b"], stride=stride, padding=k // 2))


def _basic_a(p, x, stride):
    z = _cbr_a(p["c1"], x, stride)
    z = nn.conv2d(z, p["c2"]["w"], p["c2"]["b"], padding=1)
    sc = x if "down" not in p else nn.conv2d(x, p["down"]["w"], p["down"]["b"],
                                             stride=stride)
    return jax.nn.relu(z + sc)


def apply(params, x, cfg: DBNetCfg):
    """x: (B, H, W, 3) normalized → prob map (B, H, W, 1)."""
    y = _cbr_a(params["stem"], x, stride=2)
    y = nn.max_pool(y, 3, 2, 1)
    feats = []
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        y = _basic_a(blocks[0], y, stride)
        y = _basic_a(blocks[1], y, 1)
        feats.append(y)
    c2, c3, c4, c5 = feats
    p5 = _cbr_a(params["red_c5"], c5)
    p4 = _cbr_a(params["smooth_p4"],
                _cbr_a(params["red_c4"], c4) + nn.upsample_nearest(p5))
    p3 = _cbr_a(params["smooth_p3"],
                _cbr_a(params["red_c3"], c3) + nn.upsample_nearest(p4))
    p2 = _cbr_a(params["smooth_p2"],
                _cbr_a(params["red_c2"], c2) + nn.upsample_nearest(p3))
    cat = jnp.concatenate([p2, nn.upsample_nearest(p3),
                           nn.upsample_nearest(p4, 4),
                           nn.upsample_nearest(p5, 8)], axis=-1)
    y = _cbr_a(params["neck_out"], cat)
    y = _cbr_a(params["bin0"], y)
    y = nn.conv_transpose2d(y, params["bin_up1_w"], params["bin_up1_b"], stride=2)
    y = jax.nn.relu(y * params["bin_bn"]["s"].astype(y.dtype)
                    + params["bin_bn"]["b"].astype(y.dtype))
    y = nn.conv_transpose2d(y, params["bin_up2_w"], params["bin_up2_b"], stride=2)
    return jax.nn.sigmoid(y)


def postprocess(prob_map, cfg: DBNetCfg):
    """Host-side DB boxes (ops/db.py). prob_map (B, H, W, 1) → per image
    list of (box (4,2), score)."""
    from tensorrtx_tpu.ops.db import db_boxes_from_prob

    out = []
    pm = np.asarray(prob_map)
    for i in range(pm.shape[0]):
        out.append(db_boxes_from_prob(pm[i, :, :, 0], cfg.bin_thresh,
                                      cfg.box_thresh, cfg.unclip_ratio))
    return out


register(ModelDef(
    name="dbnet",
    build_params=build_params,
    apply=apply,
    default_cfg=DBNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="DBNet text detection (reference: dbnet/)",
))
