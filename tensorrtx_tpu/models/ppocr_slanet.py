"""SLANet+ table structure recognition (PP-OCRv5 suite).

Reference: ppocrv5/src/model.cpp:1999-2237 (buildSLANetPlusModel) +
slanetLcNetBlock (block.cpp:479-493) + addSLANetCspBlock (model.cpp:532-555).

800x800 → LCNet backbone (batch_norm_* naming) → 96ch CSP-PAN → bu5
sequence (625 tokens) → GRU attention decoder (structure tokens + cell
boxes), decode fully on device via lax.while_loop.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.models import _slanet_decoder as D
from tensorrtx_tpu.ops import nn

# (cin, cout, dw, dwbn, pw, pwbn, k, stride, se); bn names use batch_norm_*
_BLOCKS = [
    (16, 32, 1, 1, 2, 2, 3, 1, False),
    (32, 64, 3, 3, 4, 4, 3, 2, False),
    (64, 64, 5, 5, 6, 6, 3, 1, False),       # → p2 tap
    (64, 128, 7, 7, 8, 8, 3, 2, False),
    (128, 128, 9, 9, 10, 10, 3, 1, False),   # → p3 tap
    (128, 256, 11, 11, 12, 12, 3, 2, False),
    (256, 256, 13, 13, 14, 14, 5, 1, False),
    (256, 256, 15, 15, 16, 16, 5, 1, False),
    (256, 256, 17, 17, 18, 18, 5, 1, False),
    (256, 256, 19, 19, 20, 20, 5, 1, False),
    (256, 256, 21, 21, 22, 22, 5, 1, False),  # → p4 tap
    (256, 512, 23, 23, 26, 24, 5, 2, True),
    (512, 512, 27, 25, 30, 26, 5, 1, True),   # → p5 tap
]
_TAPS = {2: "p2", 4: "p3", 10: "p4", 12: "p5"}

# csp block name tuples: (left, leftBn, r0, r0Bn, r1, r1Bn, dw, dwBn,
#                         r2, r2Bn, out, outBn)
_CSP = {
    "td4": (36, 5, 35, 4, 38, 7, 39, 8, 40, 9, 37, 6),
    "td3": (42, 11, 41, 10, 44, 13, 45, 14, 46, 15, 43, 12),
    "td2": (48, 17, 47, 16, 50, 19, 51, 20, 52, 21, 49, 18),
    "bu3": (56, 25, 55, 24, 58, 27, 59, 28, 60, 29, 57, 26),
    "bu4": (64, 33, 63, 32, 66, 35, 67, 36, 68, 37, 65, 34),
    "bu5": (72, 41, 71, 40, 74, 43, 75, 44, 76, 45, 73, 42),
}


@dataclasses.dataclass
class SlanetCfg:
    input_h: int = 800
    input_w: int = 800
    max_steps: int = 501


def _cbh(wm, conv, bn, co, ci, k, groups=1, bn_prefix="batch_norm"):
    return P.pconv_bn(wm, f"conv2d_{conv}", f"{bn_prefix}_{bn}", co, ci, k,
                      groups=groups)


def _csp_params(wm, names, cin):
    l, lb, r0, r0b, r1, r1b, dw, dwb, r2, r2b, o, ob = names
    return {"left": _cbh(wm, l, lb, 48, cin, 1, bn_prefix="batch_norm2d"),
            "r0": _cbh(wm, r0, r0b, 48, cin, 1, bn_prefix="batch_norm2d"),
            "r1": _cbh(wm, r1, r1b, 48, 48, 1, bn_prefix="batch_norm2d"),
            "dw": _cbh(wm, dw, dwb, 48, 48, 5, groups=48,
                       bn_prefix="batch_norm2d"),
            "r2": _cbh(wm, r2, r2b, 48, 48, 1, bn_prefix="batch_norm2d"),
            "out": _cbh(wm, o, ob, 96, 96, 1, bn_prefix="batch_norm2d")}


def build_params(wm, cfg: SlanetCfg):
    p = {"stem": _cbh(wm, 0, 0, 16, 3, 3), "blocks": []}
    for (ci, co, dw, dwbn, pw, pwbn, k, s, se) in _BLOCKS:
        bp = {"dw": _cbh(wm, dw, dwbn, ci, ci, k, groups=ci),
              "pw": _cbh(wm, pw, pwbn, co, ci, 1)}
        if se:
            bp["se_r"] = P.pconv(wm, f"conv2d_{dw + 1}", ci // 4, ci, 1)
            bp["se_e"] = P.pconv(wm, f"conv2d_{dw + 2}", ci, ci // 4, 1)
        p["blocks"].append(bp)
    for i, (name, src_c) in enumerate(
            [("p2", 64), ("p3", 128), ("p4", 256), ("p5", 512)]):
        p[name] = _cbh(wm, 31 + i, i, 96, src_c, 1, bn_prefix="batch_norm2d")
    for key, names in _CSP.items():
        p[key] = _csp_params(wm, names, 192)
    p["down3_dw"] = _cbh(wm, 53, 22, 96, 96, 5, groups=96,
                         bn_prefix="batch_norm2d")
    p["down3_pw"] = _cbh(wm, 54, 23, 96, 96, 1, bn_prefix="batch_norm2d")
    p["down4_dw"] = _cbh(wm, 61, 30, 96, 96, 5, groups=96,
                         bn_prefix="batch_norm2d")
    p["down4_pw"] = _cbh(wm, 62, 31, 96, 96, 1, bn_prefix="batch_norm2d")
    p["down5_dw"] = _cbh(wm, 69, 38, 96, 96, 5, groups=96,
                         bn_prefix="batch_norm2d")
    p["down5_pw"] = _cbh(wm, 70, 39, 96, 96, 1, bn_prefix="batch_norm2d")
    p["dec"] = D.build_decoder_params(
        wm, 96, 256, "linear_0", "linear_1", "linear_2",
        "linear_3", "linear_4", "linear_5", "linear_6")
    return p


def _hs(x):
    return nn.hardswish(x)


def _csp(bp, x):
    left = _hs(P.conv(x, bp["left"]))
    r = _hs(P.conv(x, bp["r0"]))
    r = _hs(P.conv(r, bp["r1"]))
    r = _hs(P.conv(r, bp["dw"], padding=2, groups=48))
    r = _hs(P.conv(r, bp["r2"]))
    return _hs(P.conv(jnp.concatenate([r, left], axis=-1), bp["out"]))


def _down(pdw, ppw, x):
    y = _hs(P.conv(x, pdw, stride=2, padding=2, groups=96))
    return _hs(P.conv(y, ppw))


def apply(params, x, cfg: SlanetCfg):
    """x: (B=1, H, W, 3) imagenet-normalized → (loc, char_logits, length)."""
    y = _hs(P.conv(x, params["stem"], stride=2, padding=1))
    taps = {}
    for i, (spec, bp) in enumerate(zip(_BLOCKS, params["blocks"])):
        ci, co, dw, dwbn, pw, pwbn, k, s, se = spec
        y = _hs(P.conv(y, bp["dw"], stride=s, padding=k // 2, groups=ci))
        if se:
            y = P.se_layer(y, bp["se_r"], bp["se_e"])
        y = _hs(P.conv(y, bp["pw"]))
        if i in _TAPS:
            taps[_TAPS[i]] = y
    p2 = _hs(P.conv(taps["p2"], params["p2"]))
    p3 = _hs(P.conv(taps["p3"], params["p3"]))
    p4 = _hs(P.conv(taps["p4"], params["p4"]))
    p5 = _hs(P.conv(taps["p5"], params["p5"]))

    td4 = _csp(params["td4"],
               jnp.concatenate([nn.upsample_nearest(p5), p4], axis=-1))
    td3 = _csp(params["td3"],
               jnp.concatenate([nn.upsample_nearest(td4), p3], axis=-1))
    td2 = _csp(params["td2"],
               jnp.concatenate([nn.upsample_nearest(td3), p2], axis=-1))
    bu3 = _csp(params["bu3"], jnp.concatenate(
        [_down(params["down3_dw"], params["down3_pw"], td2), td3], axis=-1))
    bu4 = _csp(params["bu4"], jnp.concatenate(
        [_down(params["down4_dw"], params["down4_pw"], bu3), td4], axis=-1))
    bu5 = _csp(params["bu5"], jnp.concatenate(
        [_down(params["down5_dw"], params["down5_pw"], bu4), p5], axis=-1))

    b, h, w, c = bu5.shape
    seq = bu5.reshape(b, h * w, c)
    return D.decode(params["dec"], seq, 256, cfg.max_steps)


def postprocess(outputs, cfg: SlanetCfg):
    loc_buf, char_buf, length = outputs
    loc, probs = D.postprocess(loc_buf, char_buf, length)
    ids = probs.argmax(-1)[0].tolist()
    return {"loc": loc, "probs": probs, "ids": ids}


register(ModelDef(
    name="slanet_plus",
    build_params=build_params,
    apply=apply,
    default_cfg=SlanetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="SLANet+ table structure (reference: ppocrv5/src/model.cpp:1999)",
))
