"""YOLO26 det — yolo11-style backbone (C3K2/SPPF/C2PSA) with an
attention-C3K2 final stage and an NMS-free end-to-end (one2one) head with
direct ltrb regression (reg_max = 1, no DFL).

Reference: yolo26/src/model.cpp:33-403 (buildEngineYolo26Det),
yolo26/src/block.cpp:273-330 (C3K2 with `attn` variant: each m.i is
bottleneck + PSABlock), decode at model.cpp:230-330 (x1y1 = grid − lt,
x2y2 = grid + rb, × stride; sigmoid cls; top-k without NMS — plugin
yololayer.cu:178-250 ≙ ops.nms.select_topk).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.models.yolo11 import SCALES, _flatten_levels
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_topk


@dataclasses.dataclass
class Yolo26Cfg:
    scale: str = "n"
    task: str = "det"           # det | obb | cls
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.25
    max_det: int = 300
    postprocess: str = "topk"   # NMS-free head

    @property
    def multipliers(self):
        return SCALES[self.scale]


def _chans(cfg):
    gd, gw, maxc = cfg.multipliers
    return (lambda x: B.get_width(x, gw, maxc)), (lambda x: B.get_depth(x, gd))


def _c3k2_attn_p(wm, name, c1, c2, n, e=0.5):
    """C3K2 attn variant (block.cpp:295-300): m.i = bottleneck → PSABlock."""
    c_ = int(c2 * e)
    return {
        "cv1": B.conv_p(wm, f"{name}.cv1", c1, 2 * c_),
        "cv2": B.conv_p(wm, f"{name}.cv2", (2 + n) * c_, c2),
        "m": [{"b": B.bottleneck_p(wm, f"{name}.m.{i}.0", c_, c_, e=0.5),
               "psa": B.psablock_p(wm, f"{name}.m.{i}.1", c_)}
              for i in range(n)],
    }


def _c3k2_attn_a(p, x):
    y = B.conv_a(p["cv1"], x)
    c_ = y.shape[-1] // 2
    parts = [y[..., :c_], y[..., c_:]]
    cur = parts[1]
    for m in p["m"]:
        cur = B.bottleneck_a(m["b"], cur, shortcut=True)
        cur = B.psablock_a(m["psa"], cur, shortcut=True)
        parts.append(cur)
    return B.conv_a(p["cv2"], jnp.concatenate(parts, axis=-1))


def _build_cls_params(wm, cfg):
    """buildEngineYolo26Cls (model.cpp:874-...): backbone 0..8 + C2PSA at
    model.9 + Classify head model.10 (1x1 conv 1280 → GAP → linear)."""
    w, d = _chans(cfg)
    c3k = cfg.scale in ("m", "l", "x")
    return {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3k2_p(wm, "model.2", w(128), w(256), d(2), c3k, e=0.25),
        "m3": B.conv_p(wm, "model.3", w(256), w(256), 3),
        "m4": B.c3k2_p(wm, "model.4", w(256), w(512), d(2), c3k, e=0.25),
        "m5": B.conv_p(wm, "model.5", w(512), w(512), 3),
        "m6": B.c3k2_p(wm, "model.6", w(512), w(512), d(2), True, e=0.5),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c3k2_p(wm, "model.8", w(1024), w(1024), d(2), True, e=0.5),
        "m9": B.c2psa_p(wm, "model.9", w(1024), w(1024), d(2)),
        "m10_conv": B.conv_p(wm, "model.10.conv", w(1024), 1280, 1),
        "m10_linear": wm.linear("model.10.linear", cfg.num_classes, 1280),
    }


def build_params(wm, cfg: Yolo26Cfg):
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
        "m6": B.c3k2_p(wm, "model.6", w(512), w(512), d(2), True, e=0.5),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c3k2_p(wm, "model.8", w(1024), w(1024), d(2), True, e=0.5),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m10": B.c2psa_p(wm, "model.10", w(1024), w(1024), d(2)),
        "m13": B.c3k2_p(wm, "model.13", w(1024) + w(512), w(512), d(2),
                        True, e=0.5),
        "m16": B.c3k2_p(wm, "model.16", w(512) + w(512), w(256), d(2),
                        True, e=0.5),
        "m17": B.conv_p(wm, "model.17", w(256), w(256), 3),
        "m19": B.c3k2_p(wm, "model.19", w(512) + w(256), w(512), d(2),
                        True, e=0.5),
        "m20": B.conv_p(wm, "model.20", w(512), w(512), 3),
        # model.22: n fixed to 1, attention variant (model.cpp:139-143)
        "m22": _c3k2_attn_p(wm, "model.22", w(1024) + w(512), w(1024), 1),
    }
    nc = cfg.num_classes
    ch = [w(256), w(512), w(1024)]
    c2 = max(16, w(256), 64)
    c3 = max(w(256), min(nc, 100))
    head = {"cv2": [], "cv3": []}
    for i, ci in enumerate(ch):
        head["cv2"].append({
            "a": B.conv_p(wm, f"model.23.one2one_cv2.{i}.0", ci, c2 // 4, 3),
            "b": B.conv_p(wm, f"model.23.one2one_cv2.{i}.1", c2 // 4,
                          c2 // 4, 3),
            "c": wm.conv2d(f"model.23.one2one_cv2.{i}.2", 4, c2 // 4, (1, 1)),
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
    if cfg.task == "obb":
        # one2one_cv4 angle branch (buildEngineYolo26Obb, model.cpp:414-)
        p["cv4"] = [{
            "a": B.conv_p(wm, f"model.23.one2one_cv4.{i}.0", ci, c2 // 4, 3),
            "b": B.conv_p(wm, f"model.23.one2one_cv4.{i}.1", c2 // 4,
                          c2 // 4, 3),
            "c": wm.conv2d(f"model.23.one2one_cv4.{i}.2", 1, c2 // 4, (1, 1)),
        } for i, ci in enumerate(ch)]
    return p


def apply(params, x, cfg: Yolo26Cfg):
    if cfg.task == "cls":
        y = B.conv_a(params["m0"], x, stride=2)
        y = B.conv_a(params["m1"], y, stride=2)
        y = B.c3k2_a(params["m2"], y)
        y = B.conv_a(params["m3"], y, stride=2)
        y = B.c3k2_a(params["m4"], y)
        y = B.conv_a(params["m5"], y, stride=2)
        y = B.c3k2_a(params["m6"], y)
        y = B.conv_a(params["m7"], y, stride=2)
        y = B.c3k2_a(params["m8"], y)
        y = B.c2psa_a(params["m9"], y)
        y = B.conv_a(params["m10_conv"], y)
        y = nn.global_avg_pool(y)
        return nn.linear(y, params["m10_linear"]["w"],
                         params["m10_linear"]["b"])
    y = B.conv_a(params["m0"], x, stride=2)
    x1 = B.conv_a(params["m1"], y, stride=2)
    return _apply_from_x1(params, x1, cfg)


def apply_s2d(params, x4, cfg: Yolo26Cfg):
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


def _apply_from_x1(params, x1, cfg: Yolo26Cfg):
    y = B.c3k2_a(params["m2"], x1)
    y = B.conv_a(params["m3"], y, stride=2)
    return _apply_from_m3(params, y, cfg)


def _apply_from_m3(params, y, cfg: Yolo26Cfg):
    c4, y = B.c3k2_down_a(params["m4"], params["m5"], y)
    c6 = B.c3k2_a(params["m6"], y)
    y = B.conv_a(params["m7"], c6, stride=2)
    y = B.c3k2_a(params["m8"], y)
    y = B.sppf_a(params["m9"], y)
    c10 = B.c2psa_a(params["m10"], y)
    u = nn.upsample_nearest(c10)
    c13 = B.c3k2_a(params["m13"], jnp.concatenate([u, c6], -1))
    u = nn.upsample_nearest(c13)
    p3 = B.c3k2_a(params["m16"], jnp.concatenate([u, c4], -1))
    y = B.conv_a(params["m17"], p3, stride=2)
    p4 = B.c3k2_a(params["m19"], jnp.concatenate([y, c13], -1))
    y = B.conv_a(params["m20"], p4, stride=2)
    p5 = _c3k2_attn_a(params["m22"], jnp.concatenate([y, c10], -1))

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

    ltrb = _flatten_levels(box_lv).astype(jnp.float32)      # raw, no DFL
    # best_class per level before the flatten (nc-wide flattens are pure
    # relayout time at batch 1; values/order identical)
    b0 = cls_lv[0].shape[0]
    cc = [D.best_class(lv.astype(jnp.float32)) for lv in cls_lv]
    conf = jnp.concatenate([c.reshape(b0, -1) for c, _ in cc], 1)
    cls_id = jnp.concatenate([c.reshape(b0, -1) for _, c in cc], 1)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))

    extras = None
    if cfg.task == "obb":
        ang_lv = []
        for i, f in enumerate(feats):
            q = params["cv4"][i]
            ya = B.conv_a(q["b"], B.conv_a(q["a"], f))
            ang_lv.append(nn.conv2d(ya, q["c"]["w"], q["c"]["b"]))
        ang_raw = _flatten_levels(ang_lv)[..., 0].astype(jnp.float32)
        cx, cy, w_, h_, ang = D.decode_obb(ltrb, ang_raw, points,
                                           strides_flat)
        boxes = jnp.stack([cx, cy, w_, h_], axis=-1)
        extras = ang[..., None]
    else:
        boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        out = {"boxes": boxes, "conf": conf, "cls": cls_id}
        if extras is not None:
            out["extras"] = extras
        return out
    return select_topk(boxes, conf, cls_id, cfg.conf_thresh,
                       cfg.max_det, extras=extras).as_dict()


register(ModelDef(
    name="yolo26",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolo26Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLO26 det, NMS-free one2one head (reference: yolo26/)",
))
