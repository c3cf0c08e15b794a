"""PP-OCRv5 mobile text detection (PPLCNetV3 backbone + RSE-FPN + DB head).

Reference: ppocrv5/src/model.cpp:1393-1541 (buildPPOCRv5MobileDet) +
src/block.cpp helpers. Weight naming is the Paddle export convention:
  conv:   {name}.w_0 / .b_0
  BN:     {name}.w_0(γ) .b_0(β) .w_1(μ) .w_2(σ²), eps 1e-5
  affine: learnable_affine_block_N.w_0 (scalar scale) / .w_1 (scalar shift)
LearnableRepLayer = fused rep-conv + scalar affine (+ hardswish + affine).
RSE = conv → SE gate (hard-sigmoid, slope 0.2) → x + x·gate.
The ppocrv5_db_layer.cu sigmoid plugin is the final jnp.sigmoid.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# (conv_name, out, k, s, depthwise, affine_idx, act, se(squeeze, c0, c1) or None)
_BACKBONE = [
    ("conv2d_161", 16, 3, 1, True, 0, True, None),
    ("conv2d_162", 32, 1, 1, False, 2, True, None),
    ("conv2d_163", 32, 3, 2, True, 4, False, None),
    ("conv2d_164", 48, 1, 1, False, 6, True, None),
    ("conv2d_165", 48, 3, 1, True, 8, True, None),
    ("conv2d_166", 48, 1, 1, False, 10, True, None),     # → lateral0
    ("conv2d_167", 48, 3, 2, True, 12, False, None),
    ("conv2d_168", 96, 1, 1, False, 14, True, None),
    ("conv2d_169", 96, 3, 1, True, 16, True, None),
    ("conv2d_170", 96, 1, 1, False, 18, True, None),     # → lateral1
    ("conv2d_171", 96, 3, 2, True, 20, False, None),
    ("conv2d_172", 192, 1, 1, False, 22, True, None),
    ("conv2d_173", 192, 5, 1, True, 24, True, None),
    ("conv2d_174", 192, 1, 1, False, 26, True, None),
    ("conv2d_175", 192, 5, 1, True, 28, True, None),
    ("conv2d_176", 192, 1, 1, False, 30, True, None),
    ("conv2d_177", 192, 5, 1, True, 32, True, None),
    ("conv2d_178", 192, 1, 1, False, 34, True, None),
    ("conv2d_179", 192, 5, 1, True, 36, True, None),
    ("conv2d_180", 192, 1, 1, False, 38, True, None),    # → lateral2
    ("conv2d_181", 192, 5, 2, True, 40, False, (48, "conv2d_96", "conv2d_97")),
    ("conv2d_182", 384, 1, 1, False, 42, True, None),
    ("conv2d_183", 384, 5, 1, True, 44, True, (96, "conv2d_107", "conv2d_108")),
    ("conv2d_184", 384, 1, 1, False, 46, True, None),
    ("conv2d_185", 384, 5, 1, True, 48, True, None),
    ("conv2d_186", 384, 1, 1, False, 50, True, None),
    ("conv2d_187", 384, 5, 1, True, 52, True, None),
    ("conv2d_188", 384, 1, 1, False, 54, True, None),    # → lateral3
]
_LATERAL_AT = {"conv2d_166": 0, "conv2d_170": 1, "conv2d_180": 2, "conv2d_188": 3}
_LATERALS = [("conv2d_131", 48, 12), ("conv2d_132", 96, 18),
             ("conv2d_133", 192, 42), ("conv2d_134", 384, 360)]
_RSE_IN = [("conv2d_135", "conv2d_136", "conv2d_137", 12),
           ("conv2d_141", "conv2d_142", "conv2d_143", 18),
           ("conv2d_147", "conv2d_148", "conv2d_149", 42),
           ("conv2d_153", "conv2d_154", "conv2d_155", 360)]
_RSE_OUT = [("conv2d_138", "conv2d_139", "conv2d_140"),
            ("conv2d_144", "conv2d_145", "conv2d_146"),
            ("conv2d_150", "conv2d_151", "conv2d_152"),
            ("conv2d_156", "conv2d_157", "conv2d_158")]


@dataclasses.dataclass
class PpocrDetCfg:
    input_h: int = 640
    input_w: int = 640
    bin_thresh: float = 0.3
    box_thresh: float = 0.6
    unclip_ratio: float = 1.5


def _conv(wm, name, co, ci, k, groups=1, bias=True):
    w = wm.tensor(f"{name}.w_0", (co, ci // groups, k, k))
    return {"w": np.transpose(w, (2, 3, 1, 0)),
            "b": wm.vec(f"{name}.b_0", co) if bias else None}


def _bn(wm, name, ch, eps=1e-5):
    g = wm.vec(f"{name}.w_0", ch)
    b = wm.vec(f"{name}.b_0", ch)
    m = wm.vec(f"{name}.w_1", ch)
    v = wm.vec(f"{name}.w_2", ch)
    s = g / np.sqrt(v + eps)
    return {"s": s, "b": b - m * s}


def _affine(wm, idx):
    return {"s": wm.vec(f"learnable_affine_block_{idx}.w_0", 1),
            "b": wm.vec(f"learnable_affine_block_{idx}.w_1", 1)}


def build_params(wm, cfg: PpocrDetCfg):
    # convBn convs carry no bias (block.cpp:152-163 passes emptywts)
    p = {"stem": _conv(wm, "conv2d_0", 16, 3, 3, bias=False),
         "stem_bn": _bn(wm, "batch_norm2d_0", 16),
         "backbone": []}
    cin = 16
    for (name, co, k, s, dw, aff, act, se) in _BACKBONE:
        groups = cin if dw else 1
        bp = {"conv": _conv(wm, name, co, cin, k, groups),
              "a0": _affine(wm, aff)}
        if act:
            bp["a1"] = _affine(wm, aff + 1)
        if se is not None:
            sq, c0, c1 = se
            bp["se_r"] = _conv(wm, c0, sq, co, 1)
            bp["se_e"] = _conv(wm, c1, co, sq, 1)
        p["backbone"].append(bp)
        cin = co
    p["lateral"] = [_conv(wm, n, co, ci, 1) for n, ci, co in _LATERALS]
    p["rse_in"] = []
    for (cn, c0, c1, ci) in _RSE_IN:
        p["rse_in"].append({
            "conv": {"w": np.transpose(wm.tensor(f"{cn}.w_0", (96, ci, 1, 1)),
                                       (2, 3, 1, 0)), "b": None},
            "se_r": _conv(wm, c0, 24, 96, 1),
            "se_e": _conv(wm, c1, 96, 24, 1),
        })
    p["rse_out"] = []
    for (cn, c0, c1) in _RSE_OUT:
        p["rse_out"].append({
            "conv": {"w": np.transpose(wm.tensor(f"{cn}.w_0", (24, 96, 3, 3)),
                                       (2, 3, 1, 0)), "b": None},
            "se_r": _conv(wm, c0, 6, 24, 1),
            "se_e": _conv(wm, c1, 24, 6, 1),
        })
    p["head_conv"] = _conv(wm, "conv2d_159", 24, 96, 3)
    p["head_bn0"] = _bn(wm, "batch_norm_0", 24)
    up0 = wm.tensor("conv2d_transpose_0.w_0", (24, 24, 2, 2))
    p["up0"] = {"w": np.transpose(up0, (2, 3, 1, 0)),
                "b": wm.vec("conv2d_transpose_0.b_0", 24)}
    p["head_bn1"] = _bn(wm, "batch_norm_1", 24)
    up1 = wm.tensor("conv2d_transpose_1.w_0", (24, 1, 2, 2))
    p["up1"] = {"w": np.transpose(up1, (2, 3, 1, 0)),
                "b": wm.vec("conv2d_transpose_1.b_0", 1)}
    return p


def _hswish(x):
    return x * jnp.clip(x / 6.0 + 0.5, 0.0, 1.0)


def _se(x, se_r, se_e, slope):
    w = jnp.mean(x, axis=(1, 2), keepdims=True)
    w = jax.nn.relu(nn.conv2d(w, se_r["w"], se_r["b"]))
    w = nn.conv2d(w, se_e["w"], se_e["b"])
    return x * jnp.clip(slope * w + 0.5, 0.0, 1.0)


def _rep_a(bp, x, k, s, dw):
    groups = bp["conv"]["w"].shape[3] if dw else 1
    if dw:
        groups = x.shape[-1]
    y = nn.conv2d(x, bp["conv"]["w"], bp["conv"]["b"], stride=s,
                  padding=k // 2, groups=groups)
    y = y * bp["a0"]["s"].astype(y.dtype) + bp["a0"]["b"].astype(y.dtype)
    if "a1" in bp:
        y = _hswish(y)
        y = y * bp["a1"]["s"].astype(y.dtype) + bp["a1"]["b"].astype(y.dtype)
    # seLayer is applied to the completed rep layer (model.cpp:1450-1458)
    if "se_r" in bp:
        y = _se(y, bp["se_r"], bp["se_e"], 1.0 / 6.0)
    return y


def _rse(rp, x, slope=0.2):
    k = rp["conv"]["w"].shape[0]
    y = nn.conv2d(x, rp["conv"]["w"], None, padding=k // 2)
    gate_in = jnp.mean(y, axis=(1, 2), keepdims=True)
    g = jax.nn.relu(nn.conv2d(gate_in, rp["se_r"]["w"], rp["se_r"]["b"]))
    g = nn.conv2d(g, rp["se_e"]["w"], rp["se_e"]["b"])
    gate = jnp.clip(slope * g + 0.5, 0.0, 1.0)
    return y + y * gate


def apply(params, x, cfg: PpocrDetCfg):
    """x: (B, H, W, 3) PP-OCR-normalized → prob map (B, H, W, 1)."""
    y = nn.conv2d(x, params["stem"]["w"], params["stem"]["b"], stride=2,
                  padding=1)
    sb = params["stem_bn"]
    y = y * sb["s"].astype(y.dtype) + sb["b"].astype(y.dtype)
    laterals = [None] * 4
    for (spec, bp) in zip(_BACKBONE, params["backbone"]):
        name, co, k, s, dw, aff, act, se = spec
        y = _rep_a(bp, y, k, s, dw)
        if name in _LATERAL_AT:
            laterals[_LATERAL_AT[name]] = y
    lat = [nn.conv2d(laterals[i], params["lateral"][i]["w"],
                     params["lateral"][i]["b"]) for i in range(4)]
    rse = [_rse(params["rse_in"][i], lat[i]) for i in range(4)]
    fuse2 = rse[2] + nn.upsample_nearest(rse[3])
    fuse1 = rse[1] + nn.upsample_nearest(fuse2)
    fuse0 = rse[0] + nn.upsample_nearest(fuse1)
    out3 = _rse(params["rse_out"][3], rse[3])
    out2 = _rse(params["rse_out"][2], fuse2)
    out1 = _rse(params["rse_out"][1], fuse1)
    out0 = _rse(params["rse_out"][0], fuse0)
    neck = jnp.concatenate([nn.upsample_nearest(out3, 8),
                            nn.upsample_nearest(out2, 4),
                            nn.upsample_nearest(out1, 2), out0], axis=-1)
    h = nn.conv2d(neck, params["head_conv"]["w"], params["head_conv"]["b"],
                  padding=1)
    b0 = params["head_bn0"]
    h = jax.nn.relu(h * b0["s"].astype(h.dtype) + b0["b"].astype(h.dtype))
    h = nn.conv_transpose2d(h, params["up0"]["w"], params["up0"]["b"], stride=2)
    b1 = params["head_bn1"]
    h = jax.nn.relu(h * b1["s"].astype(h.dtype) + b1["b"].astype(h.dtype))
    h = nn.conv_transpose2d(h, params["up1"]["w"], params["up1"]["b"], stride=2)
    return jax.nn.sigmoid(h)


def postprocess(prob_map, cfg: PpocrDetCfg):
    from tensorrtx_tpu.ops.db import db_boxes_from_prob

    pm = np.asarray(prob_map)
    return [db_boxes_from_prob(pm[i, :, :, 0], cfg.bin_thresh, cfg.box_thresh,
                               cfg.unclip_ratio) for i in range(pm.shape[0])]


register(ModelDef(
    name="ppocrv5_det",
    build_params=build_params,
    apply=apply,
    default_cfg=PpocrDetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="PP-OCRv5 mobile text detection (reference: ppocrv5/)",
))
