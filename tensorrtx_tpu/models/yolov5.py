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

    nc = cfg.num_classes
    extra = 32 if cfg.task == "seg" else 0
    b = x1.shape[0]
    strides = (8, 16, 32)
    boxes_all, conf_all, cls_all, coef_all = [], [], [], []
    for i, f in enumerate([p3, p4, p5]):
        raw = nn.conv2d(f, params["det"][i]["w"], params["det"][i]["b"])
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
    doc="YOLOv5 det, anchor-based decode (reference: yolov5/)",
))
