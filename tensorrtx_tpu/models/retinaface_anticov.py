"""RetinaFaceAntiCov — face + mask detection (MNet0.25 backbone, SSH-style
context heads, per-anchor type/mask score).

Reference: retinafaceAntiCov/retinafaceAntiCov.cpp:272-410 (createEngine:
mobilenet-0.25 dw/pw chain conv_1..conv_14 + conv_final, FPN laterals with
fixed all-ones 2x2 grouped deconv upsample, rf_head/rf_head2 SSH contexts,
cls/type softmax over anchor pairs via reshapeSoftmax :256, mxnet BN naming
*_gamma/_beta/_moving_mean/_moving_var, eps 1e-3 conv / 2e-5 bias-conv) and
decode.cu:110-149 (priors cx = 7.5 + x·step, sizes {2·anchor, anchor} for
base anchors 16/64/256 at strides 8/16/32; box = prior + reg·size with
exp wh and the (w−1)/2 corner shift; landmarks at 0.2·size; mask conf from
concat channel 36+k; conf gate 0.5 then host NMS).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.detect import bexp
from tensorrtx_tpu.ops.nms import select_and_nms

# (name, out, k, stride, groups=in)
_BACKBONE = [
    ("conv_1", 16, 3, 2, 1), ("conv_2", 32, 1, 1, 1),
    ("conv_3_dw", 32, 3, 2, -1), ("conv_3", 32, 1, 1, 1),
    ("conv_4_dw", 32, 3, 1, -1), ("conv_4", 32, 1, 1, 1),
    ("conv_5_dw", 32, 3, 2, -1), ("conv_5", 64, 1, 1, 1),
    ("conv_6_dw", 64, 3, 1, -1), ("conv_6", 64, 1, 1, 1),
    ("conv_7_dw", 64, 3, 2, -1), ("conv_7", 128, 1, 1, 1),
    ("conv_8_dw", 128, 3, 1, -1), ("conv_8", 128, 1, 1, 1),
    ("conv_9_dw", 128, 3, 1, -1), ("conv_9", 128, 1, 1, 1),
    ("conv_10_dw", 128, 3, 1, -1), ("conv_10", 128, 1, 1, 1),
    ("conv_11_dw", 128, 3, 1, -1), ("conv_11", 128, 1, 1, 1),
    ("conv_12_dw", 128, 3, 1, -1), ("conv_12", 128, 1, 1, 1),
    ("conv_13_dw", 128, 3, 2, -1), ("conv_13", 256, 1, 1, 1),
    ("conv_14_dw", 256, 3, 1, -1), ("conv_14", 256, 1, 1, 1),
    ("conv_final", 256, 1, 1, 1),
]
_TAPS = {"conv_6": 0, "conv_12": 1, "conv_final": 2}


@dataclasses.dataclass
class AntiCovCfg:
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.5
    nms_thresh: float = 0.4
    max_det: int = 100
    postprocess: str = "nms"


def _bn_fold(wm, name, w, co, eps):
    g = wm.vec(f"{name}_gamma", co)
    b = wm.vec(f"{name}_beta", co)
    m = wm.vec(f"{name}_moving_mean", co)
    v = wm.vec(f"{name}_moving_var", co)
    s = g / np.sqrt(v + eps)
    return {"w": w * s[None, None, None, :], "b": b - m * s}


def _cbr(wm, name, co, ci, k, groups=1):
    """convBnRelu (:200): conv '{n}_conv2d_weight' no bias + BN eps 1e-3."""
    w = wm.tensor(f"{name}_conv2d_weight", (co, ci // groups, k, k))
    return _bn_fold(wm, f"{name}_batchnorm", np.transpose(w, (2, 3, 1, 0)),
                    co, 1e-3)


def _cbbr(wm, name, co, ci, k):
    """convBiasBnRelu (:217): conv '{n}_weight'+bias + BN '{n}_bn' 2e-5
    (conv bias folds through the BN scale)."""
    w = wm.tensor(f"{name}_weight", (co, ci, k, k))
    cb = wm.vec(f"{name}_bias", co)
    p = _bn_fold(wm, f"{name}_bn", np.transpose(w, (2, 3, 1, 0)), co, 2e-5)
    g = wm.vec(f"{name}_bn_gamma", co)
    v = wm.vec(f"{name}_bn_moving_var", co)
    p["b"] = p["b"] + cb * g / np.sqrt(v + 2e-5)
    return p


def _conv_bias(wm, name, co, ci, k):
    w = wm.tensor(f"{name}_weight", (co, ci, k, k))
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": wm.vec(f"{name}_bias", co)}


def _head_p(wm, name):
    return {"c1": _cbbr(wm, f"{name}_conv1", 32, 64, 3),
            "ctx1": _cbbr(wm, f"{name}_context_conv1", 16, 64, 3),
            "ctx2": _cbbr(wm, f"{name}_context_conv2", 16, 16, 3),
            "ctx31": _cbbr(wm, f"{name}_context_conv3_1", 16, 16, 3),
            "ctx32": _cbbr(wm, f"{name}_context_conv3_2", 16, 16, 3)}


def build_params(wm, cfg: AntiCovCfg):
    p = {"backbone": []}
    cin = 3
    for (name, co, k, s, g) in _BACKBONE:
        groups = cin if g == -1 else 1
        p["backbone"].append(_cbr(wm, name, co, cin, k, groups))
        cin = co
    p["lat3"] = _cbbr(wm, "rf_c3_lateral", 64, 256, 1)
    p["lat2"] = _cbbr(wm, "rf_c2_lateral", 64, 128, 1)
    p["aggr2"] = _cbbr(wm, "rf_c2_aggr", 64, 64, 3)
    p["lat1"] = _cbbr(wm, "rf_c1_red_conv", 64, 64, 1)
    p["aggr1"] = _cbbr(wm, "rf_c1_aggr", 64, 64, 3)
    for s in (8, 16, 32):
        p[f"head{s}"] = _head_p(wm, f"rf_head_stride{s}")
        p[f"head2_{s}"] = _head_p(wm, f"rf_head2_stride{s}")
        p[f"cls{s}"] = _conv_bias(wm, f"face_rpn_cls_score_stride{s}", 4, 64, 1)
        p[f"bbox{s}"] = _conv_bias(wm, f"face_rpn_bbox_pred_stride{s}", 8, 64, 1)
        p[f"lmk{s}"] = _conv_bias(wm, f"face_rpn_landmark_pred_stride{s}",
                                  20, 64, 1)
        p[f"type{s}"] = _conv_bias(wm, f"face_rpn_type_score_stride{s}",
                                   6, 64, 1)
    return p


def _run_cbr(pp, x, stride=1, groups=1, relu=True):
    k = pp["w"].shape[0]
    y = nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2,
                  groups=groups)
    return jax.nn.relu(y) if relu else y


def _head_a(hp, x):
    """SSH context head: concat(conv1_bn, ctx2_bn, ctx3_2_bn) → relu.
    The concatenated parts are conv+BN WITHOUT relu (:228-251)."""
    c1 = _run_cbr(hp["c1"], x, relu=False)
    ctx = _run_cbr(hp["ctx1"], x)
    c2 = _run_cbr(hp["ctx2"], ctx, relu=False)
    c3 = _run_cbr(hp["ctx32"], _run_cbr(hp["ctx31"], ctx), relu=False)
    return jax.nn.relu(jnp.concatenate([c1, c2, c3], -1))


def _pair_softmax(x, groups):
    """reshapeSoftmax (:256): (B,H,W,C) → softmax across the C/groups
    chunks at matching positions (softmax over axis of size C/groups)."""
    b, h, w, c = x.shape
    y = x.reshape(b, h, w, c // groups, groups)
    y = jax.nn.softmax(y.astype(jnp.float32), axis=-2)
    return y.reshape(b, h, w, c)


def _decode_level(cls, bbox, lmk, typ, step, anchor):
    """decode.cu:110-149 semantics on dense tensors."""
    b, h, w, _ = cls.shape
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]
    cx = 7.5 + xs * step
    cy = 7.5 + ys * step
    boxes, confs, masks, lmks = [], [], [], []
    for k in range(2):
        size = anchor * 2 / (k + 1)
        conf = cls[..., 2 + k]
        dx = bbox[..., 4 * k + 0] * size
        dy = bbox[..., 4 * k + 1] * size
        bw = size * bexp(bbox[..., 4 * k + 2])
        bh = size * bexp(bbox[..., 4 * k + 3])
        x1 = (cx[..., 0] + dx) - (bw - 1) / 2
        y1 = (cy[..., 0] + dy) - (bh - 1) / 2
        boxes.append(jnp.stack([x1, y1, x1 + bw, y1 + bh], -1))
        confs.append(conf)
        masks.append(typ[..., 2 + k])   # concat channel 36+k (decode.cu:120)
        lm = [(cx[..., 0] if i % 2 == 0 else cy[..., 0])
              + lmk[..., 10 * k + i] * 0.2 * size for i in range(10)]
        lmks.append(jnp.stack(lm, -1))
    bx = jnp.stack(boxes, 3).reshape(b, -1, 4)
    return (bx, jnp.stack(confs, 3).reshape(b, -1),
            jnp.stack(masks, 3).reshape(b, -1),
            jnp.stack(lmks, 3).reshape(b, -1, 10))


def apply(params, x, cfg: AntiCovCfg):
    taps = [None] * 3
    y = x
    for (spec, pp) in zip(_BACKBONE, params["backbone"]):
        name, co, k, s, g = spec
        y = _run_cbr(pp, y, stride=s, groups=(y.shape[-1] if g == -1 else 1))
        if name in _TAPS:
            taps[_TAPS[name]] = y
    c6, c12, cfin = taps
    lat3 = _run_cbr(params["lat3"], cfin)
    # fixed all-ones 2x2 grouped deconv ≡ nearest 2x upsample (:323-331)
    up3 = nn.upsample_nearest(lat3)
    aggr2 = _run_cbr(params["aggr2"], up3 + _run_cbr(params["lat2"], c12))
    up2 = nn.upsample_nearest(aggr2)
    aggr1 = _run_cbr(params["aggr1"], up2 + _run_cbr(params["lat1"], c6))

    feats = {8: aggr1, 16: aggr2, 32: lat3}
    anchors = {8: 16, 16: 64, 32: 256}
    boxes_all, conf_all, mask_all = [], [], []
    for s in (8, 16, 32):
        f = feats[s]
        h1 = _head_a(params[f"head{s}"], f)
        h2 = _head_a(params[f"head2_{s}"], f)
        cls = _pair_softmax(
            nn.conv2d(h1, params[f"cls{s}"]["w"], params[f"cls{s}"]["b"]), 2)
        bbox = nn.conv2d(h1, params[f"bbox{s}"]["w"], params[f"bbox{s}"]["b"])
        lmk = nn.conv2d(h1, params[f"lmk{s}"]["w"], params[f"lmk{s}"]["b"])
        typ = _pair_softmax(
            nn.conv2d(h2, params[f"type{s}"]["w"], params[f"type{s}"]["b"]), 2)
        bx, cf, mk, lm = _decode_level(cls.astype(jnp.float32),
                                       bbox.astype(jnp.float32),
                                       lmk.astype(jnp.float32),
                                       typ.astype(jnp.float32), s, anchors[s])
        boxes_all.append(bx)
        conf_all.append(cf)
        mask_all.append(jnp.concatenate([mk[..., None], lm], -1))
    boxes = jnp.concatenate(boxes_all, 1)
    conf = jnp.concatenate(conf_all, 1)
    extras = jnp.concatenate(mask_all, 1)    # (B, N, 1+10)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "mask": extras[..., 0],
                "landmarks": extras[..., 1:]}
    dets = select_and_nms(boxes, conf, jnp.zeros_like(conf), cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det, extras=extras)
    out = dets.as_dict()
    if dets.extras is not None:
        out["mask_conf"] = dets.extras[..., 0]
        out["landmarks"] = dets.extras[..., 1:]
    return out


register(ModelDef(
    name="retinaface-anticov",
    build_params=build_params,
    apply=apply,
    default_cfg=AntiCovCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="RetinaFaceAntiCov face+mask detection (reference: retinafaceAntiCov/)",
))
