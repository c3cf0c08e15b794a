"""PP-OCRv5 server det/rec (PP-HGNetV2-style backbone).

Reference: ppocrv5/src/model.cpp:1541-1676 (buildPPOCRv5ServerDet) and
:1797-1923 (buildPPOCRv5ServerRec); HG blocks in src/block.cpp:545-744.

Server det = HGNet backbone → FPN+PAN over 1x1 laterals with 9x9 convs →
large-kernel refinement blocks (7/5/3 branch sums) → DB head (shrink+thresh,
output (shrink+thresh)/2). Server rec = same stem/HG stages with H-only or
W-only striding → 3x2 avg-pool → SVTR global mixing (dim 120) → CTC head
over 18385 classes.

All convs are NHWC with BN folded at build time; nearest upsampling via
nn.upsample_nearest.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.ops import nn


# ---- HGNet building blocks (block.cpp:545-744) -----------------------------

def _cbr(wm, conv, bn, co, ci, kh, kw=None, groups=1):
    return P.pconv_bn(wm, f"conv2d_{conv}" if isinstance(conv, int) else conv,
                      f"batch_norm2d_{bn}" if isinstance(bn, int) else bn,
                      co, ci, kh, kw, groups=groups)


def build_hg_conv_block(wm, ci, body_c, body_n, body_start, body_bn_start,
                        squeeze, squeeze_bn, squeeze_c, excite, excite_bn,
                        excite_c):
    body = []
    cin = ci
    for i in range(body_n):
        body.append(_cbr(wm, body_start + i, body_bn_start + i, body_c, cin, 3))
        cin = body_c
    total = ci + body_n * body_c
    return {"body": body,
            "squeeze": _cbr(wm, squeeze, squeeze_bn, squeeze_c, total, 1),
            "excite": _cbr(wm, excite, excite_bn, excite_c, squeeze_c, 1)}


def build_hg_standard_block(wm, ci, body_c, body_n, first_dw, first_dw_bn,
                            first_dw_c, first_stride, body_start,
                            body_bn_start, squeeze, squeeze_bn, squeeze_c,
                            excite, excite_bn, excite_c):
    first = _cbr(wm, first_dw, first_dw_bn, first_dw_c, ci, 3,
                 groups=first_dw_c)
    body = []
    cin = first_dw_c
    for i in range(body_n):
        body.append(_cbr(wm, body_start + i, body_bn_start + i, body_c, cin, 3))
        cin = body_c
    total = first_dw_c + body_n * body_c
    del first_stride  # static; passed to apply_hg_block at the call site
    return {"first": first, "body": body,
            "squeeze": _cbr(wm, squeeze, squeeze_bn, squeeze_c, total, 1),
            "excite": _cbr(wm, excite, excite_bn, excite_c, squeeze_c, 1)}


def build_hg_light_block(wm, ci, body_c, body_n, body_start, body_bn_start,
                         squeeze, squeeze_bn, squeeze_c, excite, excite_bn,
                         excite_c, residual):
    body = []
    cin = ci
    for i in range(body_n):
        pw = _cbr(wm, body_start + i * 2, body_bn_start + i * 2, body_c, cin, 1)
        dw = _cbr(wm, body_start + i * 2 + 1, body_bn_start + i * 2 + 1,
                  body_c, body_c, 5, groups=body_c)
        body.append({"pw": pw, "dw": dw})
        cin = body_c
    total = ci + body_n * body_c
    del residual  # static; passed to apply_hg_block at the call site
    return {"body": body,
            "squeeze": _cbr(wm, squeeze, squeeze_bn, squeeze_c, total, 1),
            "excite": _cbr(wm, excite, excite_bn, excite_c, squeeze_c, 1)}


def apply_hg_block(bp, x, first_stride=None, residual=False):
    """HG{Conv,Standard,Light}Block: dense feature concat → squeeze/excite.

    The block kind is inferred from the param structure ('first' key ⇒
    standard; body items with 'pw' ⇒ light); stride/residual are static.
    """
    feats = [x]
    y = x
    if "first" in bp:
        y = P.conv(y, bp["first"], stride=first_stride, padding=1,
                   groups=bp["first"]["w"].shape[3])
        feats = [y]
    light = bool(bp["body"]) and "pw" in bp["body"][0]
    for item in bp["body"]:
        if light:
            y = P.conv(y, item["pw"])  # 1x1, linear (no act)
            y = jax.nn.relu(P.conv(y, item["dw"], padding=2,
                                   groups=item["dw"]["w"].shape[3]))
        else:
            y = jax.nn.relu(P.conv(y, item, padding=1))
        feats.append(y)
    cat = jnp.concatenate(feats, axis=-1)
    y = jax.nn.relu(P.conv(cat, bp["squeeze"]))
    y = jax.nn.relu(P.conv(y, bp["excite"]))
    if residual:
        y = y + x
    return y


def _same_pool2(x):
    """addPaddingNd post (1,1) + 2x2 max pool stride 1 (model.cpp:1557-1561)."""
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)),
                 constant_values=-jnp.inf)
    return nn.max_pool(xp, 2, stride=1)


def _same_cbr2(x, p):
    """addSameConvBnReluTensor: pad bottom/right k-1, k=2 conv s1."""
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return jax.nn.relu(P.conv(xp, p))


def build_hg_stem(wm, names=("conv2d_0", "conv2d_1", "conv2d_2"),
                  bns=("batch_norm2d_0", "batch_norm2d_1", "batch_norm2d_2")):
    return {"s0": P.pconv_bn(wm, names[0], bns[0], 32, 3, 3),
            "s1": P.pconv_bn(wm, names[1], bns[1], 16, 32, 2),
            "s2": P.pconv_bn(wm, names[2], bns[2], 32, 16, 2)}


def apply_hg_stem(p, x):
    s0 = jax.nn.relu(P.conv(x, p["s0"], stride=2, padding=1))
    s1 = _same_cbr2(s0, p["s1"])
    s2 = _same_cbr2(s1, p["s2"])
    pool = _same_pool2(s0)
    return jnp.concatenate([pool, s2], axis=-1)  # 64ch


# ---- large-kernel refinement block (server det; block.cpp:706-744) ---------

def build_large_kernel_block(wm, reduce_n, b7, b5, b3, expand_n, bn_name):
    def branch(names, ks):
        return [P.pconv(wm, f"conv2d_{n}", 32, 32, kh, kw)
                for n, (kh, kw) in zip(names, ks)]

    return {
        "reduce": P.pconv(wm, f"conv2d_{reduce_n}", 32, 64, 1),
        "b7": branch(b7, [(7, 7), (1, 7), (7, 1)]),
        "b5": branch(b5, [(5, 5), (1, 5), (5, 1)]),
        "b3": branch(b3, [(3, 3), (1, 3), (3, 1)]),
        "expand": P.pconv(wm, f"conv2d_{expand_n}", 64, 32, 1),
        "bn": P.pbn(wm, bn_name, 64),
    }


def apply_large_kernel_block(bp, x):
    r = P.conv(x, bp["reduce"])

    def run(branch):
        y = r
        for item in branch:
            kh, kw = item["w"].shape[0], item["w"].shape[1]
            y = P.conv(y, item, padding=(kh // 2, kw // 2))
        return y

    s = run(bp["b7"]) + run(bp["b5"]) + run(bp["b3"])
    e = P.conv(s, bp["expand"])
    sc, sh = bp["bn"]
    e = jax.nn.relu(e * sc.astype(e.dtype) + sh.astype(e.dtype))
    return x + e


# ---- server det -------------------------------------------------------------

@dataclasses.dataclass
class ServerDetCfg:
    input_h: int = 960
    input_w: int = 960
    bin_thresh: float = 0.3
    box_thresh: float = 0.6
    unclip_ratio: float = 1.5


def build_det_params(wm, cfg: ServerDetCfg):
    p = {"stem": build_hg_stem(wm)}
    p["prep0"] = _cbr(wm, 3, 3, 32, 64, 3)
    p["prep1"] = _cbr(wm, 4, 4, 48, 32, 1)
    p["c2"] = build_hg_conv_block(wm, 48, 48, 6, 5, 5, 11, 11, 64, 12, 12, 128)
    p["c3"] = build_hg_standard_block(wm, 128, 96, 6, 13, 13, 128, (2, 2),
                                      14, 14, 20, 20, 256, 21, 21, 512)
    p["s3down"] = _cbr(wm, 22, 22, 512, 512, 3, groups=512)
    p["s3a"] = build_hg_light_block(wm, 512, 192, 6, 23, 23, 35, 35, 512,
                                    36, 36, 1024, False)
    p["s3b"] = build_hg_light_block(wm, 1024, 192, 6, 37, 37, 49, 49, 512,
                                    50, 50, 1024, True)
    p["c4"] = build_hg_light_block(wm, 1024, 192, 6, 51, 51, 63, 63, 512,
                                   64, 64, 1024, True)
    p["s4down"] = _cbr(wm, 65, 65, 1024, 1024, 3, groups=1024)
    p["c5"] = build_hg_light_block(wm, 1024, 384, 6, 66, 66, 78, 78, 1024,
                                   79, 79, 2048, False)
    p["l5"] = P.pconv(wm, "conv2d_92", 256, 2048, 1, bias=False)
    p["l4"] = P.pconv(wm, "conv2d_88", 256, 1024, 1, bias=False)
    p["l3"] = P.pconv(wm, "conv2d_84", 256, 512, 1, bias=False)
    p["l2"] = P.pconv(wm, "conv2d_81", 256, 128, 1, bias=False)
    for n, key in ((93, "p5c"), (89, "p4c"), (85, "p3c"), (82, "p2c")):
        p[key] = P.pconv(wm, f"conv2d_{n}", 64, 256, 9, bias=False)
    p["p2down"] = P.pconv(wm, "conv2d_86", 64, 64, 3, bias=False)
    p["n3down"] = P.pconv(wm, "conv2d_90", 64, 64, 3, bias=False)
    p["n4down"] = P.pconv(wm, "conv2d_94", 64, 64, 3, bias=False)
    for n, key in ((83, "o2pre"), (87, "o3pre"), (91, "o4pre"), (95, "o5pre")):
        p[key] = P.pconv(wm, f"conv2d_{n}", 64, 64, 9, bias=False)
    p["lk_o5"] = build_large_kernel_block(
        wm, 129, (137, 131, 134), (138, 132, 135), (139, 133, 136), 130,
        "batch_norm2d_83")
    p["lk_o4"] = build_large_kernel_block(
        wm, 118, (126, 120, 123), (127, 121, 124), (128, 122, 125), 119,
        "batch_norm2d_82")
    p["lk_o3"] = build_large_kernel_block(
        wm, 107, (115, 109, 112), (116, 110, 113), (117, 111, 114), 108,
        "batch_norm2d_81")
    p["lk_o2"] = build_large_kernel_block(
        wm, 96, (104, 98, 101), (105, 99, 102), (106, 100, 103), 97,
        "batch_norm2d_80")
    p["head_conv"] = P.pconv_bn(wm, "conv2d_140", "batch_norm_0", 64, 256, 3)
    up0 = wm.tensor("conv2d_transpose_0.w_0", (64, 64, 2, 2))
    p["up0"] = {"w": np.transpose(up0, (2, 3, 1, 0)),
                "b": wm.vec("conv2d_transpose_0.b_0", 64)}
    p["head_bn1"] = P.pbn(wm, "batch_norm_1", 64)
    up1 = wm.tensor("conv2d_transpose_1.w_0", (64, 1, 2, 2))
    p["up1"] = {"w": np.transpose(up1, (2, 3, 1, 0)),
                "b": wm.vec("conv2d_transpose_1.b_0", 1)}
    p["thresh_conv"] = P.pconv_bn(wm, "conv2d_142", "batch_norm_4", 64, 65, 3)
    p["thresh_out"] = P.pconv(wm, "conv2d_143", 1, 64, 1)
    return p


def det_apply(params, x, cfg: ServerDetCfg):
    """x: (B, H, W, 3) PP-OCR-normalized → fused prob map (B, H, W, 1)."""
    y = apply_hg_stem(params["stem"], x)
    y = jax.nn.relu(P.conv(y, params["prep0"], stride=2, padding=1))
    y = jax.nn.relu(P.conv(y, params["prep1"]))
    c2 = apply_hg_block(params["c2"], y)
    c3 = apply_hg_block(params["c3"], c2, first_stride=(2, 2))
    y = P.conv(c3, params["s3down"], stride=2, padding=1, groups=512)
    y = apply_hg_block(params["s3a"], y)
    y = apply_hg_block(params["s3b"], y, residual=True)
    c4 = apply_hg_block(params["c4"], y, residual=True)
    y = P.conv(c4, params["s4down"], stride=2, padding=1, groups=1024)
    c5 = apply_hg_block(params["c5"], y)

    l5 = P.conv(c5, params["l5"])
    l4 = P.conv(c4, params["l4"])
    l3 = P.conv(c3, params["l3"])
    l2 = P.conv(c2, params["l2"])
    p4 = l4 + nn.upsample_nearest(l5)
    p3 = l3 + nn.upsample_nearest(p4)
    p2 = l2 + nn.upsample_nearest(p3)

    p5c = P.conv(l5, params["p5c"], padding=4)
    p4c = P.conv(p4, params["p4c"], padding=4)
    p3c = P.conv(p3, params["p3c"], padding=4)
    p2c = P.conv(p2, params["p2c"], padding=4)
    n3 = p3c + P.conv(p2c, params["p2down"], stride=2, padding=1)
    n4 = p4c + P.conv(n3, params["n3down"], stride=2, padding=1)
    n5 = p5c + P.conv(n4, params["n4down"], stride=2, padding=1)

    o2 = apply_large_kernel_block(params["lk_o2"],
                                  P.conv(p2c, params["o2pre"], padding=4))
    o3 = apply_large_kernel_block(params["lk_o3"],
                                  P.conv(n3, params["o3pre"], padding=4))
    o4 = apply_large_kernel_block(params["lk_o4"],
                                  P.conv(n4, params["o4pre"], padding=4))
    o5 = apply_large_kernel_block(params["lk_o5"],
                                  P.conv(n5, params["o5pre"], padding=4))
    neck = jnp.concatenate([nn.upsample_nearest(o5, 8),
                            nn.upsample_nearest(o4, 4),
                            nn.upsample_nearest(o3, 2), o2], axis=-1)

    h = jax.nn.relu(P.conv(neck, params["head_conv"], padding=1))
    h = nn.conv_transpose2d(h, params["up0"]["w"], params["up0"]["b"],
                            stride=2)
    sc, sh = params["head_bn1"]
    h = jax.nn.relu(h * sc.astype(h.dtype) + sh.astype(h.dtype))
    shrink = jax.nn.sigmoid(nn.conv_transpose2d(
        h, params["up1"]["w"], params["up1"]["b"], stride=2))
    feat_up = nn.upsample_nearest(h, 2)
    t = jnp.concatenate([shrink, feat_up], axis=-1)
    t = jax.nn.relu(P.conv(t, params["thresh_conv"], padding=1))
    thresh = jax.nn.sigmoid(P.conv(t, params["thresh_out"]))
    return (shrink + thresh) * 0.5


def det_postprocess(prob_map, cfg: ServerDetCfg):
    from tensorrtx_tpu.ops.db import db_boxes_from_prob

    pm = np.asarray(prob_map)
    return [db_boxes_from_prob(pm[i, :, :, 0], cfg.bin_thresh, cfg.box_thresh,
                               cfg.unclip_ratio) for i in range(pm.shape[0])]


register(ModelDef(
    name="ppocrv5_server_det",
    build_params=build_det_params,
    apply=det_apply,
    default_cfg=ServerDetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=det_postprocess,
    doc="PP-OCRv5 server det (reference: ppocrv5/src/model.cpp:1541)",
))


# ---- server rec -------------------------------------------------------------

@dataclasses.dataclass
class ServerRecCfg:
    input_h: int = 48
    input_w: int = 320
    num_classes: int = 18385


def _svtr_params(wm, ln0, qkv, proj, ln1, m0, m1, dim=120):
    return {"ln0": P.pln(wm, ln0, dim),
            "qkv": P.plinear(wm, qkv, dim, 3 * dim),
            "proj": P.plinear(wm, proj, dim, dim),
            "ln1": P.pln(wm, ln1, dim),
            "mlp0": P.plinear(wm, m0, dim, 2 * dim),
            "mlp1": P.plinear(wm, m1, 2 * dim, dim)}


def build_rec_params(wm, cfg: ServerRecCfg):
    p = {"stem": build_hg_stem(wm)}
    p["prep0"] = _cbr(wm, 3, 3, 32, 64, 3)
    p["prep1"] = _cbr(wm, 4, 4, 48, 32, 1)
    p["c2"] = build_hg_standard_block(wm, 48, 48, 6, 5, 5, 48, (2, 1),
                                      6, 6, 12, 12, 64, 13, 13, 128)
    p["c3"] = build_hg_standard_block(wm, 128, 96, 6, 14, 14, 128, (1, 2),
                                      15, 15, 21, 21, 256, 22, 22, 512)
    p["s3down"] = _cbr(wm, 23, 23, 512, 512, 3, groups=512)
    p["s3a"] = build_hg_light_block(wm, 512, 192, 6, 24, 24, 36, 36, 512,
                                    37, 37, 1024, False)
    p["s3b"] = build_hg_light_block(wm, 1024, 192, 6, 38, 38, 50, 50, 512,
                                    51, 51, 1024, True)
    p["c4"] = build_hg_light_block(wm, 1024, 192, 6, 52, 52, 64, 64, 512,
                                   65, 65, 1024, True)
    p["s4down"] = _cbr(wm, 66, 66, 1024, 1024, 3, groups=1024)
    p["c5"] = build_hg_light_block(wm, 1024, 384, 6, 67, 67, 79, 79, 1024,
                                   80, 80, 2048, False)
    p["enc0"] = P.pconv_bn(wm, "conv2d_82", "batch_norm2d_81", 256, 2048, 1, 3)
    p["enc1"] = P.pconv_bn(wm, "conv2d_83", "batch_norm2d_82", 120, 256, 1, 1)
    p["svtr0"] = _svtr_params(wm, "layer_norm_0", "linear_1", "linear_2",
                              "layer_norm_1", "linear_3", "linear_4")
    p["svtr1"] = _svtr_params(wm, "layer_norm_2", "linear_5", "linear_6",
                              "layer_norm_3", "linear_7", "linear_8")
    p["svtr_ln"] = P.pln(wm, "layer_norm_4", 120)
    p["enc2"] = P.pconv_bn(wm, "conv2d_84", "batch_norm2d_83", 2048, 120, 1, 1)
    p["enc3"] = P.pconv_bn(wm, "conv2d_85", "batch_norm2d_84", 256, 4096, 1, 3)
    p["enc4"] = P.pconv_bn(wm, "conv2d_86", "batch_norm2d_85", 120, 256, 1, 1)
    p["fc"] = P.plinear(wm, "linear_9", 120, cfg.num_classes)
    return p


def rec_apply(params, x, cfg: ServerRecCfg):
    """x: (B, 48, W, 3) PP-OCR-normalized → CTC probs (B, W//8, classes)."""
    from tensorrtx_tpu.models.ppocr_rec import _svtr_block

    y = apply_hg_stem(params["stem"], x)
    y = jax.nn.relu(P.conv(y, params["prep0"], padding=1))
    y = jax.nn.relu(P.conv(y, params["prep1"]))
    y = apply_hg_block(params["c2"], y, first_stride=(2, 1))
    y = apply_hg_block(params["c3"], y, first_stride=(1, 2))
    y = P.conv(y, params["s3down"], stride=(2, 1), padding=1, groups=512)
    y = apply_hg_block(params["s3a"], y)
    y = apply_hg_block(params["s3b"], y, residual=True)
    y = apply_hg_block(params["c4"], y, residual=True)
    y = P.conv(y, params["s4down"], stride=(2, 1), padding=1, groups=1024)
    y = apply_hg_block(params["c5"], y)  # (B, 3, W/4, 2048)
    y = nn.avg_pool(y, (3, 2), stride=(3, 2))  # (B, 1, W/8, 2048)

    def swish(v):
        return v * jax.nn.sigmoid(v)

    e0 = swish(P.conv(y, params["enc0"], padding=(0, 1)))
    e1 = swish(P.conv(e0, params["enc1"]))
    b, _, w, _ = e1.shape
    seq = e1.reshape(b, w, 120)
    seq = _svtr_block(params["svtr0"], seq)
    seq = _svtr_block(params["svtr1"], seq)
    seq = P.layer_norm(seq, params["svtr_ln"], eps=1e-6)
    e2 = swish(P.conv(seq.reshape(b, 1, w, 120), params["enc2"]))
    cat = jnp.concatenate([y, e2], axis=-1)
    e3 = swish(P.conv(cat, params["enc3"], padding=(0, 1)))
    e4 = swish(P.conv(e3, params["enc4"]))
    logits = P.linear(e4.reshape(b, w, 120), params["fc"])
    return jax.nn.softmax(logits, axis=-1)


def rec_postprocess(probs, cfg: ServerRecCfg):
    """CTC greedy collapse (blank=0), per batch item → [(ids, confs)]."""
    from tensorrtx_tpu.ops.ctc import ctc_greedy_decode

    pm = np.asarray(probs)
    ids = pm.argmax(-1)
    return [ctc_greedy_decode(ids[i], pm[i].max(-1)) for i in range(len(pm))]


register(ModelDef(
    name="ppocrv5_server_rec",
    build_params=build_rec_params,
    apply=rec_apply,
    default_cfg=ServerRecCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=rec_postprocess,
    doc="PP-OCRv5 server rec (reference: ppocrv5/src/model.cpp:1797)",
))
