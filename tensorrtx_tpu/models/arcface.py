"""ArcFace LResNet-IR face embedding (r50 / r100).

Reference: arcface/arcface-r50.cpp (resUnit:149, addPRelu:111, head :181-230,
cosine-similarity driver :387-409), arcface-r100.cpp. Weights come from
MXNet/insightface, so names use the MXNet convention:
  {name}_weight, {name}_gamma/_beta/_moving_mean/_moving_var (BN, eps 2e-5),
  {name}_gamma (PReLU slope).

IR unit: BN → conv3x3 → BN → PReLU → conv3x3(stride) → BN, shortcut
(identity or conv1x1(stride)+BN), sum. Head: conv0 → bn0 → PReLU → 4 stages →
bn1 → FC(512) → BN1d → 512-d embedding. The PReLU plugin (prelu.cu:118-139)
is a single fused jnp.where here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 2e-5

UNITS = {"r50": (3, 4, 14, 3), "r100": (3, 13, 30, 3)}


@dataclasses.dataclass
class ArcFaceCfg:
    variant: str = "r50"
    emb_dim: int = 512
    input_h: int = 112
    input_w: int = 112


def _mx_bn(wm, name, ch):
    gamma = wm.vec(f"{name}_gamma", ch)
    beta = wm.vec(f"{name}_beta", ch)
    mean = wm.vec(f"{name}_moving_mean", ch)
    var = wm.vec(f"{name}_moving_var", ch)
    scale = gamma / np.sqrt(var + BN_EPS)
    return {"s": scale, "b": beta - mean * scale}


def _mx_conv(wm, name, co, ci, k):
    w = wm.tensor(f"{name}_weight", (co, ci, k, k))
    return {"w": np.transpose(w, (2, 3, 1, 0))}


def build_params(wm, cfg: ArcFaceCfg):
    u = UNITS[cfg.variant]
    p = {
        "conv0": _mx_conv(wm, "conv0", 64, 3, 3),
        "bn0": _mx_bn(wm, "bn0", 64),
        "relu0": wm.vec("relu0_gamma", 64),
    }
    stages = []
    cin = 64
    for si, n in enumerate(u):
        f = 64 * (2 ** si)
        units = []
        for ui in range(1, n + 1):
            name = f"stage{si + 1}_unit{ui}"
            dim_match = ui > 1
            up = {
                "bn1": _mx_bn(wm, f"{name}_bn1", cin if not dim_match else f),
                "conv1": _mx_conv(wm, f"{name}_conv1", f, cin if not dim_match else f, 3),
                "bn2": _mx_bn(wm, f"{name}_bn2", f),
                "prelu": wm.vec(f"{name}_relu1_gamma", f),
                "conv2": _mx_conv(wm, f"{name}_conv2", f, f, 3),
                "bn3": _mx_bn(wm, f"{name}_bn3", f),
            }
            if not dim_match:
                up["convsc"] = _mx_conv(wm, f"{name}_conv1sc", f, cin, 1)
                up["bnsc"] = _mx_bn(wm, f"{name}_sc", f)
            units.append(up)
            cin = f
        stages.append(units)
    p["stages"] = stages
    p["bn1"] = _mx_bn(wm, "bn1", 512)
    fm_h = cfg.input_h // 16
    fm_w = cfg.input_w // 16
    p["fc"] = {
        "w": wm.tensor("pre_fc1_weight", (cfg.emb_dim, 512 * fm_h * fm_w)).T.copy(),
        "b": wm.vec("pre_fc1_bias", cfg.emb_dim),
    }
    p["fc_bn"] = _mx_bn(wm, "fc1", cfg.emb_dim)
    return p


def _bn(x, p):
    return x * p["s"].astype(x.dtype) + p["b"].astype(x.dtype)


def apply(params, x, cfg: ArcFaceCfg):
    """x: (B, 112, 112, 3) normalized input → (B, 512) raw embedding."""
    y = nn.conv2d(x, params["conv0"]["w"], None, padding=1)
    y = _bn(y, params["bn0"])
    y = nn.prelu(y, params["relu0"])
    for units in params["stages"]:
        for ui, up in enumerate(units):
            s = 2 if ui == 0 else 1
            z = _bn(y, up["bn1"])
            z = nn.conv2d(z, up["conv1"]["w"], None, padding=1)
            z = _bn(z, up["bn2"])
            z = nn.prelu(z, up["prelu"])
            z = nn.conv2d(z, up["conv2"]["w"], None, stride=s, padding=1)
            z = _bn(z, up["bn3"])
            if "convsc" in up:
                sc = nn.conv2d(y, up["convsc"]["w"], None, stride=s)
                sc = _bn(sc, up["bnsc"])
            else:
                sc = y
            y = z + sc
    y = _bn(y, params["bn1"])
    b = y.shape[0]
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
    y = nn.linear(y, params["fc"]["w"], params["fc"]["b"])
    return _bn(y, params["fc_bn"])


def preprocess(img_rgb: np.ndarray) -> np.ndarray:
    """(x - 127.5) * 0.0078125 (arcface-r50.cpp:391-395)."""
    return ((img_rgb.astype(np.float32) - 127.5) * 0.0078125)


def cosine_similarity(e1, e2) -> float:
    """L2-normalize + dot (arcface-r50.cpp:387-409)."""
    a = np.asarray(e1).reshape(-1)
    b = np.asarray(e2).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


register(ModelDef(
    name="arcface",
    build_params=build_params,
    apply=apply,
    default_cfg=ArcFaceCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ArcFace r50/r100 face embeddings (reference: arcface/)",
))


# ---- mobilefacenet (arcface-mobilefacenet.cpp:149-256) ----------------------

def _mfn_cbr(wm, name, co, ci, k, groups=1):
    """conv_bn_relu: conv (no bias) + mxnet BN (eps 1e-3) + PReLU."""
    return {"conv": _mx_conv(wm, f"{name}_conv2d", co, ci // groups, k),
            "bn": _mx_bn(wm, f"{name}_batchnorm", co),
            "prelu": wm.vec(f"{name}_relu_gamma", co)}


def _mfn_dw(wm, name, inp, oup, groups):
    """DepthWise: 1x1 sep (→groups) + dw 3x3 + 1x1 proj (→oup)."""
    return {"sep": _mfn_cbr(wm, f"{name}_conv_sep", groups, inp, 1),
            "dw": _mfn_cbr(wm, f"{name}_conv_dw", groups, 1, 3),
            "proj": {"conv": _mx_conv(wm, f"{name}_conv_proj_conv2d", oup,
                                      groups, 1),
                     "bn": _mx_bn(wm, f"{name}_conv_proj_batchnorm", oup)}}


# (kind, name, inp, oup, groups, stride); residual adds input
_MFN_BLOCKS = [
    ("dw", "dconv_23", 64, 64, 128, 2),
    *[("res", f"res_3_block{i}", 64, 64, 128, 1) for i in range(4)],
    ("dw", "dconv_34", 64, 128, 256, 2),
    *[("res", f"res_4_block{i}", 128, 128, 256, 1) for i in range(6)],
    ("dw", "dconv_45", 128, 128, 512, 2),
    *[("res", f"res_5_block{i}", 128, 128, 256, 1) for i in range(2)],
]


def build_mfn_params(wm, cfg: ArcFaceCfg):
    p = {"conv1": _mfn_cbr(wm, "conv_1", 64, 3, 3),
         "conv2dw": _mfn_cbr(wm, "conv_2_dw", 64, 64, 3, groups=64),
         "blocks": [_mfn_dw(wm, name, inp, oup, g)
                    for (_, name, inp, oup, g, _s) in _MFN_BLOCKS],
         "conv6sep": _mfn_cbr(wm, "conv_6sep", 512, 128, 1),
         "conv6dw": {"conv": _mx_conv(wm, "conv_6dw7_7_conv2d", 512, 1, 7),
                     "bn": _mx_bn(wm, "conv_6dw7_7_batchnorm", 512)},
         "fc": {"w": wm.tensor("fc1_weight", (cfg.emb_dim, 512)).T.copy(),
                "b": wm.vec("pre_fc1_bias", cfg.emb_dim)}}
    # output BN "fc1" with eps 2e-5 (arcface-mobilefacenet.cpp:250)
    g = wm.vec("fc1_gamma", cfg.emb_dim)
    beta = wm.vec("fc1_beta", cfg.emb_dim)
    m = wm.vec("fc1_moving_mean", cfg.emb_dim)
    v = wm.vec("fc1_moving_var", cfg.emb_dim)
    s = g / np.sqrt(v + 2e-5)
    p["fc_bn"] = {"s": s, "b": beta - m * s}
    return p


def _mfn_cbr_a(p, x, stride=1, groups=1):
    k = p["conv"]["w"].shape[0]
    y = nn.conv2d(x, p["conv"]["w"], None, stride=stride, padding=k // 2,
                  groups=groups)
    y = _bn(y, p["bn"])
    return nn.prelu(y, p["prelu"])


def mfn_apply(params, x, cfg: ArcFaceCfg):
    """x: (B, 112, 112, 3) normalized → (B, 128) embedding."""
    y = _mfn_cbr_a(params["conv1"], x, stride=2)
    y = _mfn_cbr_a(params["conv2dw"], y, groups=64)
    for (kind, name, inp, oup, g, s), bp in zip(_MFN_BLOCKS,
                                                params["blocks"]):
        z = _mfn_cbr_a(bp["sep"], y)
        z = _mfn_cbr_a(bp["dw"], z, stride=s, groups=g)
        z = nn.conv2d(z, bp["proj"]["conv"]["w"], None)
        z = _bn(z, bp["proj"]["bn"])
        y = y + z if kind == "res" else z
    y = _mfn_cbr_a(params["conv6sep"], y)
    y = nn.conv2d(y, params["conv6dw"]["conv"]["w"], None, groups=512)
    y = _bn(y, params["conv6dw"]["bn"])
    y = y.reshape(y.shape[0], -1)
    y = nn.linear(y, params["fc"]["w"], params["fc"]["b"])
    return _bn(y, params["fc_bn"])


register(ModelDef(
    name="arcface-mobilefacenet",
    build_params=build_mfn_params,
    apply=mfn_apply,
    default_cfg=lambda: ArcFaceCfg(variant="mobilefacenet", emb_dim=128),
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="ArcFace MobileFaceNet (reference: arcface/arcface-mobilefacenet.cpp)",
))
