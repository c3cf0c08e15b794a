"""YOLOv10 det — NMS-free one2one head, SCDown/PSA/C2fCIB blocks.

Reference: yolov10/src/model.cpp:33-1280 (buildEngineYolov10Det{N,S,M,BL,X})
+ src/block.cpp (SCDown :279, PSA :360, RepVGGDW :388, CIB :405,
C2fCIB :433); plugin yololayer.cu:157 decode-only top-k (no NMS) ≙
ops.nms.select_topk.

Per-scale structure: certain C2F modules become C2fCIB (compact inverted
block); n/s use the large-kernel RepVGGDW inside the final CIBs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_topk

SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "b": (0.67, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}
# modules that are C2fCIB per scale; value = lk (RepVGGDW) flag
_CIB = {
    "n": {22: True},
    "s": {8: True, 22: True},
    "m": {8: False, 19: False, 22: False},
    "b": {8: False, 13: False, 19: False, 22: False},
    "l": {8: False, 13: False, 19: False, 22: False},
    "x": {6: False, 8: False, 13: False, 19: False, 22: False},
}


@dataclasses.dataclass
class Yolov10Cfg:
    scale: str = "n"
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    reg_max: int = 16
    conf_thresh: float = 0.25
    max_det: int = 300
    postprocess: str = "topk"   # NMS-free (yololayer.cu:157)


def _chans(cfg):
    gd, gw, maxc = SCALES[cfg.scale]
    return (lambda x: B.get_width(x, gw, maxc)), (lambda x: B.get_depth(x, gd))


# ---- v10-specific blocks -----------------------------------------------------

def _scdown_p(wm, name, ci, co):
    """SCDown (block.cpp:279-295): 1x1 conv+bn+silu then dw 3x3 s2 conv+bn."""
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, co, 1),
            "cv2": wm.conv_bn(f"{name}.cv2.conv", f"{name}.cv2.bn", co, co,
                              (3, 3), groups=co, eps=1e-3)}


def _scdown_a(p, x):
    y = B.conv_a(p["cv1"], x)
    return nn.conv2d(y, p["cv2"]["w"], p["cv2"]["b"], stride=2, padding=1,
                     groups=y.shape[-1])


def _repvggdw_p(wm, name, ch):
    """RepVGGDW (block.cpp:388-404): dw7x7 + dw3x3 conv+bn sum, silu."""
    return {"conv": wm.conv_bn(f"{name}.conv.conv", f"{name}.conv.bn", ch,
                               ch, (7, 7), groups=ch, eps=1e-3),
            "conv1": wm.conv_bn(f"{name}.conv1.conv", f"{name}.conv1.bn", ch,
                                ch, (3, 3), groups=ch, eps=1e-3)}


def _repvggdw_a(p, x):
    ch = x.shape[-1]
    y = nn.conv2d(x, p["conv"]["w"], p["conv"]["b"], padding=3, groups=ch)
    y = y + nn.conv2d(x, p["conv1"]["w"], p["conv1"]["b"], padding=1,
                      groups=ch)
    return nn.silu(y)


def _cib_p(wm, name, c1, c2, lk, e=1.0):
    c_ = int(c2 * e)
    p = {"c0": B.conv_p(wm, f"{name}.cv1.0", c1, c1, 3, groups=c1),
         "c1": B.conv_p(wm, f"{name}.cv1.1", c1, 2 * c_, 1),
         "c3": B.conv_p(wm, f"{name}.cv1.3", 2 * c_, c2, 1),
         "c4": B.conv_p(wm, f"{name}.cv1.4", c2, c2, 3, groups=c2)}
    if lk:
        p["lk"] = _repvggdw_p(wm, f"{name}.cv1.2", 2 * c_)
    else:
        p["c2"] = B.conv_p(wm, f"{name}.cv1.2", 2 * c_, 2 * c_, 3,
                           groups=2 * c_)
    return p


def _cib_a(p, x):
    y = B.dwconv_a(p["c0"], x)
    y = B.conv_a(p["c1"], y)
    if "lk" in p:
        y = _repvggdw_a(p["lk"], y)
    else:
        y = B.dwconv_a(p["c2"], y)
    y = B.conv_a(p["c3"], y)
    y = B.dwconv_a(p["c4"], y)
    return x + y  # shortcut always true with c1 == c2 here


def _c2fcib_p(wm, name, c1, c2, n, lk, e=0.5):
    c_ = int(c2 * e)
    return {"cv1": B.conv_p(wm, f"{name}.cv1", c1, 2 * c_, 1),
            "cv2": B.conv_p(wm, f"{name}.cv2", (2 + n) * c_, c2, 1),
            "m": [_cib_p(wm, f"{name}.m.{i}", c_, c_, lk)
                  for i in range(n)]}


def _c2fcib_a(p, x):
    y = B.conv_a(p["cv1"], x)
    c_ = y.shape[-1] // 2
    parts = [y[..., :c_], y[..., c_:]]
    cur = parts[1]
    for m in p["m"]:
        cur = _cib_a(m, cur)
        parts.append(cur)
    return B.conv_a(p["cv2"], jnp.concatenate(parts, -1))


def _psa_p(wm, name, ch):
    """PSA (block.cpp:360-386): split + attention/ffn on one half."""
    c = ch // 2
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ch, ch, 1),
            "blk": B.psablock_p(wm, name, c),
            "cv2": B.conv_p(wm, f"{name}.cv2", ch, ch, 1)}


def _psa_a(p, x):
    y = B.conv_a(p["cv1"], x)
    c = y.shape[-1] // 2
    a, b = y[..., :c], y[..., c:]
    b = B.psablock_a(p["blk"], b, shortcut=True)
    return B.conv_a(p["cv2"], jnp.concatenate([a, b], -1))


# ---- model -------------------------------------------------------------------

def _block_p(wm, cfg, idx, name, c1, c2, n):
    cib = _CIB[cfg.scale].get(idx)
    if cib is None:
        return B.c2f_p(wm, name, c1, c2, n)
    return _c2fcib_p(wm, name, c1, c2, n, cib)


def _block_a(p, x, shortcut):
    if "m" in p and p["m"] and "c0" in p["m"][0]:
        return _c2fcib_a(p, x)
    return B.c2f_a(p, x, shortcut=shortcut)


def build_params(wm, cfg: Yolov10Cfg):
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": _block_p(wm, cfg, 2, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": _block_p(wm, cfg, 4, "model.4", w(256), w(256), d(6)),
        "m5": _scdown_p(wm, "model.5", w(256), w(512)),
        "m6": _block_p(wm, cfg, 6, "model.6", w(512), w(512), d(6)),
        "m7": _scdown_p(wm, "model.7", w(512), w(1024)),
        "m8": _block_p(wm, cfg, 8, "model.8", w(1024), w(1024), d(3)),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m10": _psa_p(wm, "model.10", w(1024)),
        "m13": _block_p(wm, cfg, 13, "model.13", w(1024) + w(512), w(512),
                        d(3)),
        "m16": _block_p(wm, cfg, 16, "model.16", w(512) + w(256), w(256),
                        d(3)),
        "m17": B.conv_p(wm, "model.17", w(256), w(256), 3),
        "m19": _block_p(wm, cfg, 19, "model.19", w(512) + w(256), w(512),
                        d(3)),
        "m20": _scdown_p(wm, "model.20", w(512), w(512)),
        "m22": _block_p(wm, cfg, 22, "model.22", w(1024) + w(512), w(1024),
                        d(3)),
    }
    ch = [w(256), w(512), w(1024)]
    nc = cfg.num_classes
    c2 = max(16, max(ch[0] // 4, 64))
    c3 = max(ch[0], min(nc, 100))
    head = {"cv2": [], "cv3": []}
    for i, ci in enumerate(ch):
        head["cv2"].append({
            "a": B.conv_p(wm, f"model.23.one2one_cv2.{i}.0", ci, c2, 3),
            "b": B.conv_p(wm, f"model.23.one2one_cv2.{i}.1", c2, c2, 3),
            "c": wm.conv2d(f"model.23.one2one_cv2.{i}.2", cfg.reg_max * 4,
                           c2, (1, 1)),
        })
        head["cv3"].append({
            "a0": B.conv_p(wm, f"model.23.one2one_cv3.{i}.0.0", ci, ci, 3,
                           groups=ci),
            "a1": B.conv_p(wm, f"model.23.one2one_cv3.{i}.0.1", ci, c3, 1),
            "b0": B.conv_p(wm, f"model.23.one2one_cv3.{i}.1.0", c3, c3, 3,
                           groups=c3),
            "b1": B.conv_p(wm, f"model.23.one2one_cv3.{i}.1.1", c3, c3, 1),
            "c": wm.conv2d(f"model.23.one2one_cv3.{i}.2", nc, c3, (1, 1)),
        })
    p["head"] = head
    return p


def apply(params, x, cfg: Yolov10Cfg):
    y = B.conv_a(params["m0"], x, stride=2)
    x1 = B.conv_a(params["m1"], y, stride=2)
    return _apply_from_x1(params, x1, cfg)


def apply_s2d(params, x4, cfg: Yolov10Cfg):
    """Fused-serving fast path from the 4×4 space-to-depth letterbox tensor
    (see models/yolo11.py apply_s2d)."""
    return _apply_from_x1(
        params, B.stem_s2d_a(params["m0"], params["m1"], x4), cfg)


apply_s2d.factor = 4


def _apply_from_x1(params, x1, cfg: Yolov10Cfg):
    y = _block_a(params["m2"], x1, shortcut=True)
    y = B.conv_a(params["m3"], y, stride=2)
    c4 = _block_a(params["m4"], y, shortcut=True)
    y = _scdown_a(params["m5"], c4)
    c6 = _block_a(params["m6"], y, shortcut=True)
    y = _scdown_a(params["m7"], c6)
    y = _block_a(params["m8"], y, shortcut=True)
    y = B.sppf_a(params["m9"], y)
    c10 = _psa_a(params["m10"], y)
    u = nn.upsample_nearest(c10)
    c13 = _block_a(params["m13"], jnp.concatenate([u, c6], -1),
                   shortcut=False)
    u = nn.upsample_nearest(c13)
    p3 = _block_a(params["m16"], jnp.concatenate([u, c4], -1),
                  shortcut=False)
    y = B.conv_a(params["m17"], p3, stride=2)
    p4 = _block_a(params["m19"], jnp.concatenate([y, c13], -1),
                  shortcut=False)
    y = _scdown_a(params["m20"], p4)
    p5 = _block_a(params["m22"], jnp.concatenate([y, c10], -1),
                  shortcut=False)

    feats = [p3, p4, p5]
    box_lv, cls_lv = [], []
    for i, f in enumerate(feats):
        q = params["head"]["cv2"][i]
        yb = B.conv_a(q["b"], B.conv_a(q["a"], f))
        box_lv.append(nn.conv2d(yb, q["c"]["w"], q["c"]["b"]))
        r = params["head"]["cv3"][i]
        z = B.dwconv_a(r["a0"], f)
        z = B.conv_a(r["a1"], z)
        z = B.dwconv_a(r["b0"], z)
        z = B.conv_a(r["b1"], z)
        cls_lv.append(nn.conv2d(z, r["c"]["w"], r["c"]["b"]))

    b = x1.shape[0]
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_topk(boxes, conf, cls_id, cfg.conf_thresh,
                       cfg.max_det).as_dict()


register(ModelDef(
    name="yolov10",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov10Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv10 det, NMS-free one2one head (reference: yolov10/)",
))
