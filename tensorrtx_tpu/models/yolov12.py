"""YOLOv12 det — C3K2 early stages + A2C2f area-attention stages/neck,
yolo11-style DFL/DWConv detect head.

Reference: yolov12/src/model.cpp:27-302 (buildEngineYolo12Det),
yolov12/src/block.cpp (convBn :277 — conv bias only on .pe layers,
A2C2f :459, ABlock :499, AAttn :520 with head_dim 32, scale 1/√32,
area-chunked flash-style attention + 7x7 depthwise position encoding).
Scales per yolo12_det.cpp:116-150 (same n/s/m/l/x table as yolo11).

The TRT version expresses area attention as 14 shuffle/slice layers per
block; here it is one reshape + einsum on the MXU. Head/decode are shared
with yolo11 (models/yolo11.py) — same weight naming scheme (model.21.*).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.models.yolo11 import (SCALES, _decode_levels, _det_head_a,
                                         _det_head_p, _flatten_levels)
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

_ATTN_SCALE = 0.176777  # hardcoded in block.cpp:526 (≈ 1/√32)


@dataclasses.dataclass
class Yolov12Cfg:
    scale: str = "n"
    task: str = "det"    # det | cls | seg | pose (yolov12-tubro mains)
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    reg_max: int = 16
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    max_det: int = 300
    num_kpts: int = 17          # kNumberOfPoints (yolov12-tubro config.h:10)
    kpt_conf_thresh: float = 0.5
    postprocess: str = "nms"

    @property
    def multipliers(self):
        return SCALES[self.scale]


def _chans(cfg):
    gd, gw, maxc = cfg.multipliers
    return (lambda x: B.get_width(x, gw, maxc)), (lambda x: B.get_depth(x, gd))


def _cbn_p(wm, name, ci, co, k, groups=1):
    """yolov12 convBn (no act); conv bias exists only on .pe (block.cpp:282)."""
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (k, k),
                      groups=groups, eps=1e-3)


def _aattn_p(wm, name, dim):
    return {"qkv": _cbn_p(wm, f"{name}.qkv", dim, dim * 3, 1),
            "pe": _cbn_p(wm, f"{name}.pe", dim, dim, 7, groups=dim),
            "proj": _cbn_p(wm, f"{name}.proj", dim, dim, 1)}


def _ablock_p(wm, name, dim, mlp_ratio=2.0):
    hidden = int(dim * mlp_ratio)
    return {"attn": _aattn_p(wm, f"{name}.attn", dim),
            "mlp0": B.conv_p(wm, f"{name}.mlp.0", dim, hidden, 1),
            "mlp1": _cbn_p(wm, f"{name}.mlp.1", hidden, dim, 1)}


def _a2c2f_p(wm, name, ci, c2, a2: bool, e=0.25):
    d = 2 * int(c2 * e)   # working dim (conv1 output)
    p = {"cv1": B.conv_p(wm, f"{name}.cv1", ci, d, 1)}
    if a2:
        p["m"] = [_ablock_p(wm, f"{name}.m.{i}.{j}", d)
                  for i in range(2) for j in range(2)]
        p["cv2"] = B.conv_p(wm, f"{name}.cv2", 3 * d, c2, 1)
    else:
        p["m0"] = B.c3k_p(wm, f"{name}.m.0", d, d, n=2)
        p["cv2"] = B.conv_p(wm, f"{name}.cv2", 2 * d, c2, 1)
    return p


def _aattn_a(ap, x, area: int):
    b, h, w, c = x.shape
    nh = c // 32                                 # head_dim fixed at 32
    n = (h * w) // area
    qkv = nn.conv2d(x, ap["qkv"]["w"], ap["qkv"]["b"])
    qkv = qkv.reshape(b, area, n, nh, 3, 32)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    # (b, area, n, nh, 32) → attention within each area chunk
    attn = jnp.einsum("bande,bamde->badnm", q, k) * _ATTN_SCALE
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("badnm,bamde->bande", attn, v)
    out = out.reshape(b, h, w, c)
    v_sp = v.reshape(b, h, w, c)
    pe = nn.conv2d(v_sp, ap["pe"]["w"], ap["pe"]["b"], padding=3, groups=c)
    return nn.conv2d(out + pe, ap["proj"]["w"], ap["proj"]["b"])


def _ablock_a(bp, x, area):
    x = x + _aattn_a(bp["attn"], x, area)
    y = B.conv_a(bp["mlp0"], x)
    y = nn.conv2d(y, bp["mlp1"]["w"], bp["mlp1"]["b"])
    return x + y


def _a2c2f_a(p, x, area):
    y = B.conv_a(p["cv1"], x)
    if "m" in p:   # a2 variant (structural, not a traced flag)
        h = y
        outs = []
        for i, bp in enumerate(p["m"]):
            h = _ablock_a(bp, h, area)
            if i % 2 == 1:
                outs.append(h)
        cat = jnp.concatenate([y] + outs, -1)
    else:
        cat = jnp.concatenate([y, B.c3k_a(p["m0"], y, shortcut=True)], -1)
    return B.conv_a(p["cv2"], cat)


def _build_cls_params(wm, cfg):
    """buildEngineYolov12Cls (yolov12-tubro model.cpp:133-226):
    backbone 0..8 → 1x1 conv 1280 → GAP → linear."""
    w, d = _chans(cfg)
    c3k = cfg.scale in ("m", "l", "x")
    return {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3k2_p(wm, "model.2", w(128), w(256), d(2), c3k, e=0.25),
        "m3": B.conv_p(wm, "model.3", w(256), w(256), 3),
        "m4": B.c3k2_p(wm, "model.4", w(256), w(512), d(2), c3k, e=0.25),
        "m5": B.conv_p(wm, "model.5", w(512), w(512), 3),
        "m6": _a2c2f_p(wm, "model.6", w(512), w(512), True),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": _a2c2f_p(wm, "model.8", w(1024), w(1024), True),
        "m9_conv": B.conv_p(wm, "model.9.conv", w(1024), 1280, 1),
        "m9_linear": wm.linear("model.9.linear", cfg.num_classes, 1280),
    }


def build_params(wm, cfg: Yolov12Cfg):
    if cfg.task == "cls":
        return _build_cls_params(wm, cfg)
    w, d = _chans(cfg)
    c3k = cfg.scale in ("m", "l", "x")
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3k2_p(wm, "model.2", w(128), w(256), d(2), c3k, e=0.25),
        "m3": B.conv_p(wm, "model.3", w(256), w(256), 3),
        "m4": B.c3k2_p(wm, "model.4", w(256), w(512), d(2), c3k, e=0.25),
        "m5": B.conv_p(wm, "model.5", w(512), w(512), 3),
        "m6": _a2c2f_p(wm, "model.6", w(512), w(512), True),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": _a2c2f_p(wm, "model.8", w(1024), w(1024), True),
        "m11": _a2c2f_p(wm, "model.11", w(1024) + w(512), w(512), False),
        "m14": _a2c2f_p(wm, "model.14", w(512) + w(512), w(256), False),
        "m15": B.conv_p(wm, "model.15", w(256), w(256), 3),
        "m17": _a2c2f_p(wm, "model.17", w(256) + w(512), w(512), False),
        "m18": B.conv_p(wm, "model.18", w(512), w(512), 3),
        "m20": B.c3k2_p(wm, "model.20", w(512) + w(1024), w(1024), d(2),
                        True, e=0.5),
    }
    cfg11 = _Cfg11Shim(cfg)
    p["head"] = _det_head_p(wm, cfg11, "model.21", cfg.num_classes)
    if cfg.task in ("seg", "pose"):
        import numpy as _np

        # cv4_conv_combined (yolov12-tubro model.cpp:86-112): nm_nk = 32 for
        # seg, kNumberOfPoints*3 for pose; c4 = max(w(256)/4, nm_nk)
        nm_nk = 32 if cfg.task == "seg" else cfg.num_kpts * 3
        chans = [w(256), w(512), w(1024)]
        cmid = max(w(256) // 4, nm_nk)
        p["cv4"] = [{
            "a": B.conv_p(wm, f"model.21.cv4.{i}.0", ci, cmid, 3),
            "b": B.conv_p(wm, f"model.21.cv4.{i}.1", cmid, cmid, 3),
            "c": wm.conv2d(f"model.21.cv4.{i}.2", nm_nk, cmid, (1, 1)),
        } for i, ci in enumerate(chans)]
    if cfg.task == "seg":
        import numpy as _np

        chans = [w(256), w(512), w(1024)]
        c_ = w(256)
        up_w = wm.tensor("model.21.proto.upsample.weight", (c_, c_, 2, 2))
        p["proto"] = {
            "cv1": B.conv_p(wm, "model.21.proto.cv1", chans[0], c_, 3),
            "up_w": _np.transpose(up_w, (2, 3, 1, 0)),
            "up_b": wm.vec("model.21.proto.upsample.bias", c_),
            "cv2": B.conv_p(wm, "model.21.proto.cv2", c_, c_, 3),
            "cv3": B.conv_p(wm, "model.21.proto.cv3", c_, 32, 1),
        }
    return p


class _Cfg11Shim:
    """Duck-typed view so yolo11's head builder sees the v12 scale table."""

    def __init__(self, cfg):
        self.scale = cfg.scale
        self.reg_max = cfg.reg_max
        self.multipliers = cfg.multipliers


def apply(params, x, cfg: Yolov12Cfg):
    if cfg.task == "cls":
        y = B.conv_a(params["m0"], x, stride=2)
        y = B.conv_a(params["m1"], y, stride=2)
        y = B.c3k2_a(params["m2"], y)
        y = B.conv_a(params["m3"], y, stride=2)
        y = B.c3k2_a(params["m4"], y)
        y = B.conv_a(params["m5"], y, stride=2)
        y = _a2c2f_a(params["m6"], y, area=4)
        y = B.conv_a(params["m7"], y, stride=2)
        y = _a2c2f_a(params["m8"], y, area=1)
        y = B.conv_a(params["m9_conv"], y)
        y = nn.global_avg_pool(y)
        return nn.linear(y, params["m9_linear"]["w"],
                         params["m9_linear"]["b"])
    y = B.conv_a(params["m0"], x, stride=2)
    x1 = B.conv_a(params["m1"], y, stride=2)
    return _apply_from_x1(params, x1, cfg)


def apply_s2d(params, x4, cfg: Yolov12Cfg):
    """Fused-serving fast path from the 4×4 space-to-depth letterbox tensor
    (see models/yolo11.py apply_s2d)."""
    x1 = B.stem_s2d_a(params["m0"], params["m1"], x4)
    if B.c3k2_is_plain(params["m2"]):
        # P2 stage in phase space (see models/yolo11.py apply_s2d)
        y = B.c3k2_s2d_a(params["m2"], nn.space_to_depth2(x1))
        y = nn.silu(nn.conv2d_s2d(
            y, nn.s2d_conv_weights(params["m3"]["w"]), params["m3"]["b"]))
        return _apply_from_m3(params, y, cfg)
    return _apply_from_x1(params, x1, cfg)


apply_s2d.factor = 4
apply_s2d.supports = lambda cfg: cfg.task not in ("cls",)


def _apply_from_x1(params, x1, cfg: Yolov12Cfg):
    y = B.c3k2_a(params["m2"], x1)
    y = B.conv_a(params["m3"], y, stride=2)
    return _apply_from_m3(params, y, cfg)


def _apply_from_m3(params, y, cfg: Yolov12Cfg):
    c4, y = B.c3k2_down_a(params["m4"], params["m5"], y)
    c6 = _a2c2f_a(params["m6"], y, area=4)
    y = B.conv_a(params["m7"], c6, stride=2)
    c8 = _a2c2f_a(params["m8"], y, area=1)
    u = nn.upsample_nearest(c8)
    c11 = _a2c2f_a(params["m11"], jnp.concatenate([u, c6], -1), area=1)
    u = nn.upsample_nearest(c11)
    p3 = _a2c2f_a(params["m14"], jnp.concatenate([u, c4], -1), area=1)
    y = B.conv_a(params["m15"], p3, stride=2)
    p4 = _a2c2f_a(params["m17"], jnp.concatenate([y, c11], -1), area=1)
    y = B.conv_a(params["m18"], p4, stride=2)
    p5 = B.c3k2_a(params["m20"], jnp.concatenate([y, c8], -1))

    feats = [p3, p4, p5]
    box_lv, cls_lv = _det_head_a(params["head"], feats, cfg.reg_max)
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    extras = None
    if cfg.task in ("seg", "pose"):
        b = feats[0].shape[0]
        nm_nk = 32 if cfg.task == "seg" else cfg.num_kpts * 3
        coef_lv = []
        for i, f in enumerate(feats):
            q = params["cv4"][i]
            yc = B.conv_a(q["b"], B.conv_a(q["a"], f))
            coef_lv.append(nn.conv2d(yc, q["c"]["w"], q["c"]["b"]))
        extras = jnp.concatenate([v.reshape(b, -1, nm_nk) for v in coef_lv],
                                 1).astype(jnp.float32)
        if cfg.task == "pose":
            extras = D.decode_pose(extras, points, strides_flat, boxes,
                                   cfg.kpt_conf_thresh)
    def _proto():
        pr = params["proto"]
        q = B.conv_a(pr["cv1"], feats[0])
        q = nn.silu(nn.conv_transpose2d(q, pr["up_w"], pr["up_b"], stride=2))
        q = B.conv_a(pr["cv2"], q)
        return B.conv_a(pr["cv3"], q)

    if cfg.postprocess == "raw":
        out = {"boxes": boxes, "conf": conf, "cls": cls_id}
        if extras is not None:
            out["extras"] = extras
        if cfg.task == "seg":
            out["proto"] = _proto()
        return out
    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det, extras=extras)
    if cfg.task == "seg":
        proto = _proto()
        masks = jax.nn.sigmoid(jnp.einsum("bhwc,bnc->bnhw",
                                          proto.astype(jnp.float32),
                                          dets.extras))
        return dets.as_dict() | {"masks": masks}
    return dets.as_dict()


register(ModelDef(
    name="yolov12",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov12Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv12 det, area-attention A2C2f (reference: yolov12/)",
))
