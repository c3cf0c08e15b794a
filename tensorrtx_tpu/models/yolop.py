"""YOLOP panoptic driving perception (reference: yolop/yolop.hpp —
YOLOv5-v4-era backbone: Focus stem, hardswish convBlocks, BottleneckCSP
(leaky 0.1 + eps-1e-4 BN on the cat), SPP 5/9/13; three heads: v5 anchor
detection (model.24) + drivable-area and lane segmentation decoders that
upsample back to input resolution and argmax 2 classes)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

BN_EPS = 1e-3


@dataclasses.dataclass
class YolopCfg:
    num_classes: int = 1
    input_h: int = 384
    input_w: int = 640
    img_h: int = 360        # seg maps crop back to this (Yolo::IMG_H)
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"


def _cb(wm, name, co, ci, k):
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (k, k), eps=BN_EPS)


def _csp_p(wm, name, c1, c2, n, e=0.5):
    c_ = int(c2 * e)
    p = {
        "cv1": _cb(wm, f"{name}.cv1", c_, c1, 1),
        "cv2": wm.conv2d(f"{name}.cv2", c_, c1, (1, 1), bias=False),
        "cv3": wm.conv2d(f"{name}.cv3", c_, c_, (1, 1), bias=False),
        "bn": wm.bn(f"{name}.bn", 2 * c_, 1e-4),
        "cv4": _cb(wm, f"{name}.cv4", c2, 2 * c_, 1),
        "m": [{"cv1": _cb(wm, f"{name}.m.{i}.cv1", c_, c_, 1),
               "cv2": _cb(wm, f"{name}.m.{i}.cv2", c_, c_, 3)}
              for i in range(n)],
    }
    return p


def build_params(wm, cfg: YolopCfg):
    p = {
        "m0": _cb(wm, "model.0.conv", 32, 12, 3),     # focus conv
        "m1": _cb(wm, "model.1", 64, 32, 3),
        "m2": _csp_p(wm, "model.2", 64, 64, 1),
        "m3": _cb(wm, "model.3", 128, 64, 3),
        "m4": _csp_p(wm, "model.4", 128, 128, 3),
        "m5": _cb(wm, "model.5", 256, 128, 3),
        "m6": _csp_p(wm, "model.6", 256, 256, 3),
        "m7": _cb(wm, "model.7", 512, 256, 3),
        "m8_cv1": _cb(wm, "model.8.cv1", 256, 512, 1),
        "m8_cv2": _cb(wm, "model.8.cv2", 512, 1024, 1),
        "m9": _csp_p(wm, "model.9", 512, 512, 1),
        "m10": _cb(wm, "model.10", 256, 512, 1),
        "m13": _csp_p(wm, "model.13", 512, 256, 1),
        "m14": _cb(wm, "model.14", 128, 256, 1),
        "m17": _csp_p(wm, "model.17", 256, 128, 1),
        "m18": _cb(wm, "model.18", 128, 128, 3),
        "m20": _csp_p(wm, "model.20", 256, 256, 1),
        "m21": _cb(wm, "model.21", 256, 256, 3),
        "m23": _csp_p(wm, "model.23", 512, 512, 1),
        "anchors": wm.tensor("model.24.anchor_grid", (3, 3, 2)),
    }
    no = 3 * (5 + cfg.num_classes)
    p["det"] = [wm.conv2d(f"model.24.m.{i}", no, c, (1, 1))
                for i, c in enumerate((128, 256, 512))]
    for branch, base in (("seg", 25), ("lane", 34)):
        p[branch] = {
            "c0": _cb(wm, f"model.{base}", 128, 256, 3),
            "csp1": _csp_p(wm, f"model.{base + 2}", 128, 64, 1),
            "c1": _cb(wm, f"model.{base + 3}", 32, 64, 3),
            "c2": _cb(wm, f"model.{base + 5}", 16, 32, 3),
            "csp2": _csp_p(wm, f"model.{base + 6}", 16, 8, 1),
            "c3": _cb(wm, f"model.{base + 8}", 2, 8, 3),
        }
    return p


def _hswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _cb_a(pp, x, stride=1):
    k = pp["w"].shape[0]
    return _hswish(nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2))


def _csp_a(p, x, shortcut):
    y1 = _cb_a(p["cv1"], x)
    for b in p["m"]:
        z = _cb_a(b["cv2"], _cb_a(b["cv1"], y1))
        y1 = y1 + z if shortcut else z
    y1 = nn.conv2d(y1, p["cv3"]["w"], None)
    y2 = nn.conv2d(x, p["cv2"]["w"], None)
    cat = jnp.concatenate([y1, y2], axis=-1)
    s, b = p["bn"]
    cat = nn.leaky_relu(cat * jnp.asarray(s, cat.dtype)
                        + jnp.asarray(b, cat.dtype), 0.1)
    return _cb_a(p["cv4"], cat)


def _focus(x):
    """Space-to-depth ×2 with torch slice order [::2,::2],[1::2,::2],... """
    return jnp.concatenate([x[:, ::2, ::2], x[:, 1::2, ::2],
                            x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1)


def _seg_branch(p, x):
    y = _cb_a(p["c0"], x)
    y = nn.upsample_nearest(y)
    y = _csp_a(p["csp1"], y, False)
    y = _cb_a(p["c1"], y)
    y = nn.upsample_nearest(y)
    y = _cb_a(p["c2"], y)
    y = _csp_a(p["csp2"], y, False)
    y = nn.upsample_nearest(y)
    return _cb_a(p["c3"], y)    # (B, H, W, 2)


def apply(params, x, cfg: YolopCfg):
    y = _cb_a(params["m0"], _focus(x))
    return _apply_from_focus(params, y, cfg)


def apply_s2d(params, x2, cfg: YolopCfg):
    """Fused-serving fast path: the Focus layer IS a 2×2 space-to-depth,
    so the letterbox_s2d tensor feeds m0 directly after reordering the
    channel blocks from s2d (a,b) order to torch's slice order
    [::2,::2],[1::2,::2],[::2,1::2],[1::2,1::2]."""
    b, h, w, c4 = x2.shape
    c = c4 // 4
    y = x2.reshape(b, h, w, 4, c)[:, :, :, (0, 2, 1, 3), :]
    y = _cb_a(params["m0"], y.reshape(b, h, w, c4))
    return _apply_from_focus(params, y, cfg)


apply_s2d.factor = 2


def _apply_from_focus(params, y, cfg: YolopCfg):
    y = _cb_a(params["m1"], y, stride=2)
    y = _csp_a(params["m2"], y, True)
    y = _cb_a(params["m3"], y, stride=2)
    c4 = _csp_a(params["m4"], y, True)
    y = _cb_a(params["m5"], c4, stride=2)
    c6 = _csp_a(params["m6"], y, True)
    y = _cb_a(params["m7"], c6, stride=2)
    # SPP 5/9/13
    y = _cb_a(params["m8_cv1"], y)
    y = jnp.concatenate([y, nn.max_pool(y, 5, 1, 2), nn.max_pool(y, 9, 1, 4),
                         nn.max_pool(y, 13, 1, 6)], -1)
    y = _cb_a(params["m8_cv2"], y)
    y = _csp_a(params["m9"], y, False)
    p5_in = _cb_a(params["m10"], y)
    u = nn.upsample_nearest(p5_in)
    y = _csp_a(params["m13"], jnp.concatenate([u, c6], -1), False)
    p4_in = _cb_a(params["m14"], y)
    u = nn.upsample_nearest(p4_in)
    cat16 = jnp.concatenate([u, c4], -1)
    p3 = _csp_a(params["m17"], cat16, False)
    y = _cb_a(params["m18"], p3, stride=2)
    p4 = _csp_a(params["m20"], jnp.concatenate([y, p4_in], -1), False)
    y = _cb_a(params["m21"], p4, stride=2)
    p5 = _csp_a(params["m23"], jnp.concatenate([y, p5_in], -1), False)

    # detection (v5 anchor decode)
    nc = cfg.num_classes
    b = p3.shape[0]
    strides = (8, 16, 32)
    boxes_all, conf_all, cls_all = [], [], []
    for i, f in enumerate([p3, p4, p5]):
        raw = nn.conv2d(f, params["det"][i]["w"], params["det"][i]["b"])
        h, w_ = raw.shape[1], raw.shape[2]
        bx, conf, cls_id = D.anchor_decode_level_flat(
            raw, params["anchors"][i], strides[i], nc, cfg.ignore_thresh,
            power=True)
        boxes_all.append(bx)
        conf_all.append(conf)
        cls_all.append(cls_id)
    boxes = jnp.concatenate(boxes_all, 1)
    conf = jnp.concatenate(conf_all, 1)
    cls_id = jnp.concatenate(cls_all, 1)

    # segmentation heads: crop to IMG_H rows then per-pixel argmax
    pad = (cfg.input_h - cfg.img_h) // 2
    seg = _seg_branch(params["seg"], cat16)[:, pad:pad + cfg.img_h]
    lane = _seg_branch(params["lane"], cat16)[:, pad:pad + cfg.img_h]
    seg_out = jnp.argmax(seg, axis=-1).astype(jnp.int32)
    lane_out = jnp.argmax(lane, axis=-1).astype(jnp.int32)

    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id,
                "seg": seg_out, "lane": lane_out}
    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh, cfg.nms_thresh,
                          cfg.max_det)
    return dets.as_dict() | {"seg": seg_out, "lane": lane_out}


register(ModelDef(
    name="yolop",
    build_params=build_params,
    apply=apply,
    default_cfg=YolopCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOP det + drivable-area + lane segmentation (reference: yolop/)",
))
