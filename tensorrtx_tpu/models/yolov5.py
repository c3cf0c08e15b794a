"""YOLOv5 v6.0+ det/cls/seg — the anchor-based family exemplar.

Reference: yolov5/src/model.cpp (C3 backbone, SPPF, Detect at model.24 with
anchors read from the .wts key `model.24.anchor_grid`),
yolov5/plugin/yololayer.cu:159-226 (per-anchor sigmoid decode:
xy = (cell - 0.5 + 2σ)·stride, wh = (2σ)²·anchor, conf = σ(obj)·σ(cls),
obj gate kIgnoreThresh=0.1). Same decode family covers yolov3/v4/v7/yolop.

Scales: n .33/.25 | s .33/.50 | m .67/.75 | l 1/1 | x 1.33/1.25.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

SCALES = {"n": (0.33, 0.25), "s": (0.33, 0.50), "m": (0.67, 0.75),
          "l": (1.00, 1.00), "x": (1.33, 1.25)}


@dataclasses.dataclass
class Yolov5Cfg:
    scale: str = "n"
    task: str = "det"            # det | cls | seg
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    ignore_thresh: float = 0.1   # kIgnoreThresh obj gate
    max_det: int = 300
    postprocess: str = "nms"


def _chans(cfg):
    gd, gw = SCALES[cfg.scale]

    def w(x):
        import math

        return int(math.ceil(x * gw / 8)) * 8

    def d(x):
        return max(int(round(x * gd)), 1)

    return w, d


def _build_cls_params(wm, cfg):
    """build_cls_engine (yolov5/src/model.cpp:479-537): backbone 0..8 →
    1x1 conv 1280 → GAP → linear."""
    w, d = _chans(cfg)
    return {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 6),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c3_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c3_p(wm, "model.6", w(512), w(512), d(9)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c3_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9_conv": B.conv_p(wm, "model.9.conv", w(1024), 1280, 1),
        "m9_linear": wm.linear("model.9.linear", cfg.num_classes, 1280),
    }


def build_params(wm, cfg: Yolov5Cfg):
    if cfg.task == "cls":
        return _build_cls_params(wm, cfg)
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 6),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c3_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c3_p(wm, "model.6", w(512), w(512), d(9)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c3_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m10": B.conv_p(wm, "model.10", w(1024), w(512), 1),
        "m13": B.c3_p(wm, "model.13", w(1024), w(512), d(3)),
        "m14": B.conv_p(wm, "model.14", w(512), w(256), 1),
        "m17": B.c3_p(wm, "model.17", w(512), w(256), d(3)),
        "m18": B.conv_p(wm, "model.18", w(256), w(256), 3),
        "m20": B.c3_p(wm, "model.20", w(512), w(512), d(3)),
        "m21": B.conv_p(wm, "model.21", w(512), w(512), 3),
        "m23": B.c3_p(wm, "model.23", w(1024), w(1024), d(3)),
    }
    # seg head (build_seg_engine, model.cpp:539-618): 32 mask coeffs per
    # anchor appended after (5 + nc); Proto from p3 with nearest upsample
    extra = 32 if cfg.task == "seg" else 0
    no = 3 * (5 + extra + cfg.num_classes)
    ch = [w(256), w(512), w(1024)]
    p["det"] = [wm.conv2d(f"model.24.m.{i}", no, ch[i], (1, 1)) for i in range(3)]
    # 3 levels × 3 anchors × (w, h) straight from the checkpoint
    p["anchors"] = wm.tensor("model.24.anchor_grid", (3, 3, 2))
    if cfg.task == "seg":
        c_ = w(256)
        p["proto"] = {
            "cv1": B.conv_p(wm, "model.24.proto.cv1", ch[0], c_, 3),
            "cv2": B.conv_p(wm, "model.24.proto.cv2", c_, c_, 3),
            "cv3": B.conv_p(wm, "model.24.proto.cv3", c_, 32, 1),
        }
    return p


def _apply_cls(params, x, cfg):
    y = B.conv_a(params["m0"], x, stride=2, pad=2)
    y = B.conv_a(params["m1"], y, stride=2)
    y = B.c3_a(params["m2"], y, shortcut=True)
    y = B.conv_a(params["m3"], y, stride=2)
    y = B.c3_a(params["m4"], y, shortcut=True)
    y = B.conv_a(params["m5"], y, stride=2)
    y = B.c3_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], y, stride=2)
    y = B.c3_a(params["m8"], y, shortcut=True)
    y = B.conv_a(params["m9_conv"], y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["m9_linear"]["w"], params["m9_linear"]["b"])


def apply(params, x, cfg: Yolov5Cfg):
    if cfg.task == "cls":
        return _apply_cls(params, x, cfg)
    y = B.conv_a(params["m0"], x, stride=2, pad=2)    # 6x6 s2 p2
    x1 = B.conv_a(params["m1"], y, stride=2)
    return _apply_from_x1(params, x1, cfg)


def apply_s2d(params, x4, cfg: Yolov5Cfg):
    """Fused-serving fast path from the 4×4 space-to-depth letterbox
    tensor; the 6×6 p2 stem becomes a 3×3 block conv (see
    ops/nn.s2d4_conv_weights and models/yolo11.py apply_s2d)."""
    return _apply_from_x1(
        params, B.stem_s2d_a(params["m0"], params["m1"], x4, p0_pad=2), cfg)


apply_s2d.factor = 4
apply_s2d.supports = lambda cfg: cfg.task != "cls"


def apply_chain(params, x4, cfg: Yolov5Cfg, ctx, f: int = 2):
    """Int8-resident chain mirror of the v5 det serving path — the anchor
    -based family's chained tier (see models/yolo11.apply_chain for the
    design; ops/qchain.py for the formulation). The reference ships int8
    calibration for every yolov5 engine (yolov5/src/calibrator.cpp,
    yolov5/README int8 rows); here the conv epilogues requantize to the
    consumer's scale so activations cross HBM as int8. Det task only;
    even batch ≥ 2 (the f=2 fold). `ctx.enter`: "m3" keeps the 160²
    stem/m2 stage bf16, "stem" chains everything."""
    import tensorrtx_tpu.models._yolo_qchain as Q

    assert cfg.task == "det", "chained int8 covers the det serving path"
    if ctx.enter == "m3":
        xf = nn.batch_fold(x4, f)
        w4, p4s = nn.s2d4_conv_weights(params["m0"]["w"], 2)  # 6×6 p2 stem
        y1 = nn.silu(nn.conv2d_s2d4(xf, (nn.bp_conv_weights(w4, f), p4s),
                                    None)
                     + jnp.tile(jnp.tile(params["m0"]["b"], 4), f))
        w2, p2s = nn.s2d_conv_weights(params["m1"]["w"])
        x1 = nn.silu(nn.conv2d_s2d(y1, (nn.bp_conv_weights(w2, f), p2s),
                                   nn.bp_bias(params["m1"]["b"], f)))
        xfl = B.c3_a(B.bp_c3k_p(params["m2"], f), x1, shortcut=True)
        x = ctx.quant_in(xfl)
    else:
        x = ctx.quant_in(nn.batch_fold(x4, f))
        w4, p4s = nn.s2d4_conv_weights(params["m0"]["w"], 2)
        x = ctx.conv(x, nn.bp_conv_weights(w4, f),
                     jnp.tile(jnp.tile(params["m0"]["b"], 4), f),
                     pads=((p4s[0], p4s[1]), (p4s[0], p4s[1])))
        w2, p2s = nn.s2d_conv_weights(params["m1"]["w"])
        x = ctx.conv(x, nn.bp_conv_weights(w2, f),
                     nn.bp_bias(params["m1"]["b"], f),
                     pads=((p2s[0], p2s[1]), (p2s[0], p2s[1])))
        x = Q.qc3_a(ctx, B.bp_c3k_p(params["m2"], f), x)
    x = Q.qconv_a(ctx, B.bp_conv_p(params["m3"], f), x, stride=2)
    c4f = Q.qc3_a(ctx, B.bp_c3k_p(params["m4"], f), x)
    x = ctx.map_q(Q.qconv_a(ctx, B.bp_conv_p(params["m5"], f), c4f,
                            stride=2),
                  lambda q: nn.batch_unfold(q, f))
    c6 = Q.qc3_a(ctx, params["m6"], x)
    x = Q.qc3_a(ctx, params["m8"], Q.qconv_a(ctx, params["m7"], c6,
                                             stride=2))
    x = Q.qsppf_a(ctx, params["m9"], x)
    p5_in = Q.qconv_a(ctx, params["m10"], x)
    u = ctx.upsample(p5_in)
    m13f = Q.qc3_a(ctx, B.bp_c3k_p(params["m13"], f),
                   ctx.map_q(ctx.concat([u, c6]),
                             lambda q: nn.batch_fold(q, f)),
                   shortcut=False)
    p4inf = Q.qconv_a(ctx, B.bp_conv_p(params["m14"], f), m13f)
    uf = ctx.upsample(p4inf)
    w_u = params["m14"]["w"].shape[-1]
    w_c4 = params["m4"]["cv3"]["w"].shape[-1]
    p3f = Q.qc3_a(ctx, B.bp_c3k_p(params["m17"], f,
                                  in_segments=(w_u, w_c4)),
                  ctx.concat([uf, c4f]), shortcut=False)
    xf = Q.qconv_a(ctx, B.bp_conv_p(params["m18"], f), p3f, stride=2)
    w_18 = params["m18"]["w"].shape[-1]
    p4f = Q.qc3_a(ctx, B.bp_c3k_p(params["m20"], f,
                                  in_segments=(w_18, w_u)),
                  ctx.concat([xf, p4inf]), shortcut=False)
    p4 = ctx.map_q(p4f, lambda q: nn.batch_unfold(q, f))
    x = Q.qconv_a(ctx, params["m21"], p4, stride=2)
    p5 = Q.qc3_a(ctx, params["m23"], ctx.concat([x, p5_in]),
                 shortcut=False)
    r3 = ctx.conv_out(p3f, nn.bp_conv_weights(params["det"][0]["w"], f),
                      nn.bp_bias(params["det"][0]["b"], f))
    r4 = ctx.conv_out(p4f, nn.bp_conv_weights(params["det"][1]["w"], f),
                      nn.bp_bias(params["det"][1]["b"], f))
    r5 = ctx.conv_out(p5, params["det"][2]["w"], params["det"][2]["b"])
    raw_lv = [nn.batch_unfold(r3, f), nn.batch_unfold(r4, f), r5]
    return _decode_anchor(params, raw_lv, cfg)


apply_chain.factor = 4
apply_chain.supports = lambda cfg: cfg.task == "det"


def _apply_from_x1(params, x1, cfg: Yolov5Cfg):
    # P2/P3 stages ride the row-phase motif (see _yolo_blocks.c3_down_a):
    # at batch ≤8 the C≤64 convs at the two largest grids fill only half
    # the MXU lanes and their split/concat layout copies dominate
    _, y = B.c3_down_a(params["m2"], params["m3"], x1, shortcut=True)
    c4, y = B.c3_down_a(params["m4"], params["m5"], y, shortcut=True)
    c6 = B.c3_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], c6, stride=2)
    y = B.c3_a(params["m8"], y, shortcut=True)
    y = B.sppf_a(params["m9"], y)
    p5_in = B.conv_a(params["m10"], y)
    u = nn.upsample_nearest(p5_in)
    y = B.c3_a(params["m13"], jnp.concatenate([u, c6], -1), shortcut=False)
    p4_in = B.conv_a(params["m14"], y)
    u = nn.upsample_nearest(p4_in)
    p3 = B.c3_a(params["m17"], jnp.concatenate([u, c4], -1), shortcut=False)
    y = B.conv_a(params["m18"], p3, stride=2)
    p4 = B.c3_a(params["m20"], jnp.concatenate([y, p4_in], -1), shortcut=False)
    y = B.conv_a(params["m21"], p4, stride=2)
    p5 = B.c3_a(params["m23"], jnp.concatenate([y, p5_in], -1), shortcut=False)

    raw_lv = [nn.conv2d(f, params["det"][i]["w"], params["det"][i]["b"])
              for i, f in enumerate([p3, p4, p5])]
    return _decode_anchor(params, raw_lv, cfg, p3=p3)


def _decode_anchor(params, raw_lv, cfg: Yolov5Cfg, p3=None):
    """Anchor decode + NMS tail on the three raw head maps (shared by the
    float paths and the int8 chain mirror; yololayer.cu:159-226)."""
    nc = cfg.num_classes
    extra = 32 if cfg.task == "seg" else 0
    b = raw_lv[0].shape[0]
    strides = (8, 16, 32)
    boxes_all, conf_all, cls_all, coef_all = [], [], [], []
    for i, raw in enumerate(raw_lv):
        h, w_ = raw.shape[1], raw.shape[2]
        # flatten (cell, anchor) into rows: the (b, h·w, 3, 85) form put the
        # 3 anchors in sublanes (3/8 tile occupancy — its sigmoid+argmax
        # fusions were ~620 µs of a 1.3 ms yolov5-n program on v5e)
        raw = raw.reshape(b, h * w_ * 3, 5 + extra + nc)
        pts, _ = D.make_anchor_grid(h * strides[i], w_ * strides[i], (strides[i],))
        pts3 = np.repeat(pts, 3, axis=0)                    # (h·w·3, 2) const
        anc = params["anchors"][i].astype(jnp.float32)      # (3, 2)
        anc3 = jnp.tile(anc, (h * w_, 1))                   # (h·w·3, 2)
        sxywh = jax.nn.sigmoid(raw[..., 0:4].astype(jnp.float32))
        xy = (sxywh[..., 0:2] * 2.0 - 0.5 + (pts3 - 0.5)[None]) * strides[i]
        wh = jnp.square(sxywh[..., 2:4] * 2.0) * anc3[None]
        obj = jax.nn.sigmoid(raw[..., 4].astype(jnp.float32))
        # sigmoid is monotone: max/argmax on raw logits, sigmoid the max
        # (ops/detect.py best_class rationale; saves the 85-wide sigmoid)
        cls_logits = raw[..., 5:5 + nc]
        conf_cls = jax.nn.sigmoid(
            jnp.max(cls_logits, -1).astype(jnp.float32))
        cls_id = jnp.argmax(cls_logits, -1).astype(jnp.float32)
        # obj gate (yololayer.cu:177): below ignore_thresh the cell never
        # becomes a candidate regardless of class prob
        conf = jnp.where(obj >= cfg.ignore_thresh, obj * conf_cls, 0.0)
        x1y1 = xy - wh * 0.5
        x2y2 = xy + wh * 0.5
        boxes_all.append(jnp.concatenate([x1y1, x2y2], -1))
        conf_all.append(conf)
        cls_all.append(cls_id)
        if extra:
            # raw (un-sigmoided) mask coefficients trail the (5+nc) slots
            coef_all.append(raw[..., 5 + nc:].astype(jnp.float32))
    boxes = jnp.concatenate(boxes_all, 1)
    conf = jnp.concatenate(conf_all, 1)
    cls_id = jnp.concatenate(cls_all, 1)
    extras = jnp.concatenate(coef_all, 1) if extra else None
    def _proto():
        pr = params["proto"]
        q = B.conv_a(pr["cv1"], p3)
        q = nn.upsample_nearest(q)
        q = B.conv_a(pr["cv2"], q)
        return B.conv_a(pr["cv3"], q)

    if cfg.postprocess == "raw":
        out = {"boxes": boxes, "conf": conf, "cls": cls_id}
        if extras is not None:
            out["extras"] = extras
        if cfg.task == "seg":
            out["proto"] = _proto()
        return out
    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh, cfg.nms_thresh,
                          cfg.max_det, extras=extras)
    if cfg.task == "seg":
        proto = _proto()
        masks = jax.nn.sigmoid(jnp.einsum("bhwc,bnc->bnhw",
                                          proto.astype(jnp.float32),
                                          dets.extras))
        return dets.as_dict() | {"masks": masks}
    return dets.as_dict()


register(ModelDef(
    name="yolov5",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov5Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    apply_chain=apply_chain,
    doc="YOLOv5 det, anchor-based decode (reference: yolov5/)",
))
