"""YOLOv8 det/seg/cls/pose/obb (reference: yolov8/src/model.cpp — C2F
backbone/head, Detect at model.22 with cv2 box + cv3 cls branches, Seg proto
at model.22.proto; yolov8/plugin/yololayer.cu shares the anchor-free decode
with yolo11).

Uses the shared block library and the same fused decode→top-k→NMS tail as
yolo11. Scale multipliers: n .33/.25/1024, s .33/.50/1024, m .67/.75/768,
l 1/1/512, x 1/1.25/512.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


@dataclasses.dataclass
class Yolov8Cfg:
    scale: str = "n"
    task: str = "det"            # det | seg | cls | pose | obb
    variant: str = ""            # "" | "p2" | "5u"
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    max_det: int = 300
    kpt_conf_thresh: float = 0.5
    num_kpts: int = 17
    reg_max: int = 16
    postprocess: str = "nms"


def _chans(cfg):
    gd, gw, maxc = SCALES[cfg.scale]
    if cfg.task == "cls":
        maxc = 1280  # buildEngineYolov8Cls (model.cpp:973)
    if cfg.variant == "5u":
        # get_width_5u: no max-channel cap (model.cpp:9-11)
        return (lambda x: B.get_width(x, gw, 1 << 30)), \
            (lambda x: B.get_depth(x, gd))
    return (lambda x: B.get_width(x, gw, maxc)), (lambda x: B.get_depth(x, gd))


def _det_head_p(wm, cfg, name, chans, nc):
    """Detect head: cv2 (box) + cv3 (cls) per level."""
    c2 = max(16, chans[0] // 4, cfg.reg_max * 4)
    c3 = max(chans[0], min(nc, 100))
    head = {"cv2": [], "cv3": []}
    for i, ci in enumerate(chans):
        head["cv2"].append({
            "a": B.conv_p(wm, f"{name}.cv2.{i}.0", ci, c2, 3),
            "b": B.conv_p(wm, f"{name}.cv2.{i}.1", c2, c2, 3),
            "c": wm.conv2d(f"{name}.cv2.{i}.2", cfg.reg_max * 4, c2, (1, 1)),
        })
        head["cv3"].append({
            "a": B.conv_p(wm, f"{name}.cv3.{i}.0", ci, c3, 3),
            "b": B.conv_p(wm, f"{name}.cv3.{i}.1", c3, c3, 3),
            "c": wm.conv2d(f"{name}.cv3.{i}.2", nc, c3, (1, 1)),
        })
    return head


def _extra_branch_p(wm, name, chans, cmid, cout):
    return [{"a": B.conv_p(wm, f"{name}.{i}.0", ci, cmid, 3),
             "b": B.conv_p(wm, f"{name}.{i}.1", cmid, cmid, 3),
             "c": wm.conv2d(f"{name}.{i}.2", cout, cmid, (1, 1))}
            for i, ci in enumerate(chans)]


def _build_cls_params(wm, cfg):
    """buildEngineYolov8Cls (model.cpp:969-1056): backbone 0..8 (max 1280)
    → 1x1 conv 1280 → GAP → linear."""
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c2f_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c2f_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c2f_p(wm, "model.6", w(512), w(512), d(6)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c2f_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9_conv": B.conv_p(wm, "model.9.conv", w(1024), 1280, 1),
        "m9_linear": wm.linear("model.9.linear", cfg.num_classes, 1280),
    }
    return p


def _build_p2_params(wm, cfg):
    """buildEngineYolov8DetP2 (model.cpp:653-968): 4-level P2..P5 head at
    model.28, strides (4, 8, 16, 32)."""
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c2f_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c2f_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c2f_p(wm, "model.6", w(512), w(512), d(6)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c2f_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m12": B.c2f_p(wm, "model.12", w(1024) + w(512), w(512), d(3)),
        "m15": B.c2f_p(wm, "model.15", w(512) + w(256), w(256), d(3)),
        "m18": B.c2f_p(wm, "model.18", w(256) + w(128), w(128), d(3)),
        "m19": B.conv_p(wm, "model.19", w(128), w(128), 3),
        "m21": B.c2f_p(wm, "model.21", w(256) + w(128), w(256), d(3)),
        "m22": B.conv_p(wm, "model.22", w(256), w(256), 3),
        "m24": B.c2f_p(wm, "model.24", w(512) + w(256), w(512), d(3)),
        "m25": B.conv_p(wm, "model.25", w(512), w(512), 3),
        "m27": B.c2f_p(wm, "model.27", w(1024) + w(512), w(1024), d(3)),
    }
    chans = [w(128), w(256), w(512), w(1024)]
    p["head"] = _det_head_p(wm, cfg, "model.28", chans, cfg.num_classes)
    return p


def _build_5u_params(wm, cfg):
    """buildEngineYolov8_5uDet (model.cpp:1904-2167): YOLOv5 C3 backbone
    (6x6 stem) + anchor-free v8 head at model.24."""
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 6),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c3_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c3_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c3_p(wm, "model.6", w(512), w(512), d(6)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c3_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m10": B.conv_p(wm, "model.10", w(1024), w(512), 1),
        "m13": B.c3_p(wm, "model.13", w(512) + w(512), w(512), d(3)),
        "m14": B.conv_p(wm, "model.14", w(512), w(256), 1),
        "m17": B.c3_p(wm, "model.17", w(256) + w(256), w(256), d(3)),
        "m18": B.conv_p(wm, "model.18", w(256), w(256), 3),
        "m20": B.c3_p(wm, "model.20", w(256) + w(256), w(512), d(3)),
        "m21": B.conv_p(wm, "model.21", w(512), w(512), 3),
        "m23": B.c3_p(wm, "model.23", w(512) + w(512), w(1024), d(3)),
    }
    chans = [w(256), w(512), w(1024)]
    p["head"] = _det_head_p(wm, cfg, "model.24", chans, cfg.num_classes)
    return p


def build_params(wm, cfg: Yolov8Cfg):
    if cfg.task == "cls":
        return _build_cls_params(wm, cfg)
    if cfg.variant == "p2":
        return _build_p2_params(wm, cfg)
    if cfg.variant == "5u":
        return _build_5u_params(wm, cfg)
    return _build_det_params(wm, cfg)


def _build_det_params(wm, cfg: Yolov8Cfg):
    w, d = _chans(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3),
        "m2": B.c2f_p(wm, "model.2", w(128), w(128), d(3)),
        "m3": B.conv_p(wm, "model.3", w(128), w(256), 3),
        "m4": B.c2f_p(wm, "model.4", w(256), w(256), d(6)),
        "m5": B.conv_p(wm, "model.5", w(256), w(512), 3),
        "m6": B.c2f_p(wm, "model.6", w(512), w(512), d(6)),
        "m7": B.conv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": B.c2f_p(wm, "model.8", w(1024), w(1024), d(3)),
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m12": B.c2f_p(wm, "model.12", w(1024) + w(512), w(512), d(3)),
        "m15": B.c2f_p(wm, "model.15", w(512) + w(256), w(256), d(3)),
        "m16": B.conv_p(wm, "model.16", w(256), w(256), 3),
        "m18": B.c2f_p(wm, "model.18", w(512) + w(256), w(512), d(3)),
        "m19": B.conv_p(wm, "model.19", w(512), w(512), 3),
        "m21": B.c2f_p(wm, "model.21", w(1024) + w(512), w(1024), d(3)),
    }
    ch = [w(256), w(512), w(1024)]
    nc = 1 if cfg.task == "pose" else cfg.num_classes
    p["head"] = _det_head_p(wm, cfg, "model.22", ch, nc)
    if cfg.task == "pose":
        kpt_ch = cfg.num_kpts * 3
        p["cv4"] = _extra_branch_p(wm, "model.22.cv4", ch,
                                   max(ch[0] // 4, kpt_ch), kpt_ch)
    elif cfg.task == "obb":
        p["cv4"] = _extra_branch_p(wm, "model.22.cv4", ch,
                                   max(ch[0] // 4, 1), 1)
    if cfg.task == "seg":
        import numpy as _np

        cmid = max(ch[0] // 4, 32)
        p["cv4"] = _extra_branch_p(wm, "model.22.cv4", ch, cmid, 32)
        c_ = w(256)
        up_w = wm.tensor("model.22.proto.upsample.weight", (c_, c_, 2, 2))
        p["proto"] = {
            "cv1": B.conv_p(wm, "model.22.proto.cv1", ch[0], c_, 3),
            "up_w": _np.transpose(up_w, (2, 3, 1, 0)),
            "up_b": wm.vec("model.22.proto.upsample.bias", c_),
            "cv2": B.conv_p(wm, "model.22.proto.cv2", c_, c_, 3),
            "cv3": B.conv_p(wm, "model.22.proto.cv3", c_, 32, 1),
        }
    return p


def _branch3(p, f):
    y = B.conv_a(p["a"], f)
    y = B.conv_a(p["b"], y)
    return nn.conv2d(y, p["c"]["w"], p["c"]["b"])


def _apply_cls(params, x, cfg):
    y = B.conv_a(params["m0"], x, stride=2)
    y = B.conv_a(params["m1"], y, stride=2)
    y = B.c2f_a(params["m2"], y, shortcut=True)
    y = B.conv_a(params["m3"], y, stride=2)
    y = B.c2f_a(params["m4"], y, shortcut=True)
    y = B.conv_a(params["m5"], y, stride=2)
    y = B.c2f_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], y, stride=2)
    y = B.c2f_a(params["m8"], y, shortcut=True)
    y = B.conv_a(params["m9_conv"], y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, params["m9_linear"]["w"], params["m9_linear"]["b"])


def _apply_p2(params, x, cfg):
    y = B.conv_a(params["m0"], x, stride=2)
    y = B.conv_a(params["m1"], y, stride=2)
    c2 = B.c2f_a(params["m2"], y, shortcut=True)
    y = B.conv_a(params["m3"], c2, stride=2)
    c4 = B.c2f_a(params["m4"], y, shortcut=True)
    y = B.conv_a(params["m5"], c4, stride=2)
    c6 = B.c2f_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], c6, stride=2)
    y = B.c2f_a(params["m8"], y, shortcut=True)
    p5_in = B.sppf_a(params["m9"], y)
    u = nn.upsample_nearest(p5_in)
    m12 = B.c2f_a(params["m12"], jnp.concatenate([u, c6], -1), shortcut=False)
    u = nn.upsample_nearest(m12)
    m15 = B.c2f_a(params["m15"], jnp.concatenate([u, c4], -1), shortcut=False)
    u = nn.upsample_nearest(m15)
    p2 = B.c2f_a(params["m18"], jnp.concatenate([u, c2], -1), shortcut=False)
    y = B.conv_a(params["m19"], p2, stride=2)
    p3 = B.c2f_a(params["m21"], jnp.concatenate([y, m15], -1), shortcut=False)
    y = B.conv_a(params["m22"], p3, stride=2)
    p4 = B.c2f_a(params["m24"], jnp.concatenate([y, m12], -1), shortcut=False)
    y = B.conv_a(params["m25"], p4, stride=2)
    p5 = B.c2f_a(params["m27"], jnp.concatenate([y, p5_in], -1),
                 shortcut=False)
    return [p2, p3, p4, p5]


def _apply_5u_backbone(params, x):
    y = B.conv_a(params["m0"], x, stride=2, pad=2)
    y = B.conv_a(params["m1"], y, stride=2)
    # P2/P3 C3 stages ride the row-phase motif (_yolo_blocks.c3_down_a)
    _, y = B.c3_down_a(params["m2"], params["m3"], y, shortcut=True)
    c4, y = B.c3_down_a(params["m4"], params["m5"], y, shortcut=True)
    c6 = B.c3_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], c6, stride=2)
    y = B.c3_a(params["m8"], y, shortcut=True)
    sp = B.sppf_a(params["m9"], y)
    m10 = B.conv_a(params["m10"], sp)
    u = nn.upsample_nearest(m10)
    m13 = B.c3_a(params["m13"], jnp.concatenate([u, c6], -1), shortcut=False)
    m14 = B.conv_a(params["m14"], m13)
    u = nn.upsample_nearest(m14)
    p3 = B.c3_a(params["m17"], jnp.concatenate([u, c4], -1), shortcut=False)
    y = B.conv_a(params["m18"], p3, stride=2)
    p4 = B.c3_a(params["m20"], jnp.concatenate([y, m14], -1), shortcut=False)
    y = B.conv_a(params["m21"], p4, stride=2)
    p5 = B.c3_a(params["m23"], jnp.concatenate([y, m10], -1), shortcut=False)
    return [p3, p4, p5]


def _decode_and_nms(params, feats, x, cfg, strides):
    b = x.shape[0]
    box_lv = [_branch3(params["head"]["cv2"][i], f)
              for i, f in enumerate(feats)]
    cls_lv = [_branch3(params["head"]["cv3"][i], f)
              for i, f in enumerate(feats)]
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              strides)

    extras = None
    if cfg.task == "obb":
        ang_lv = [B.conv_a(p["b"], B.conv_a(p["a"], f)) for p, f in
                  zip(params["cv4"], feats)]
        ang_lv = [nn.conv2d(v, p["c"]["w"], p["c"]["b"])
                  for v, p in zip(ang_lv, params["cv4"])]
        ang_raw = jnp.concatenate(
            [v.reshape(b, -1) for v in ang_lv], 1)
        cx, cy, w_, h_, ang = D.decode_obb(ltrb, ang_raw.astype(jnp.float32),
                                           points, strides_flat)
        boxes = jnp.stack([cx, cy, w_, h_], axis=-1)
        extras = ang[..., None]
    else:
        boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
        if cfg.task == "pose":
            kpt_lv = [_branch3(params["cv4"][i], f)
                      for i, f in enumerate(feats)]
            kpt_raw = jnp.concatenate(
                [v.reshape(b, -1, v.shape[-1]) for v in kpt_lv], 1)
            extras = D.decode_pose(kpt_raw.astype(jnp.float32), points,
                                   strides_flat, boxes, cfg.kpt_conf_thresh)
        elif cfg.task == "seg":
            coef_lv = [_branch3(params["cv4"][i], f)
                       for i, f in enumerate(feats)]
            extras = jnp.concatenate(
                [v.reshape(b, -1, 32) for v in coef_lv], 1).astype(jnp.float32)

    if cfg.postprocess == "raw":
        out = {"boxes": boxes, "conf": conf, "cls": cls_id}
        if extras is not None:
            out["extras"] = extras
        return out, feats
    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det, extras=extras,
                          obb=(cfg.task == "obb"))
    return dets, feats


def apply(params, x, cfg: Yolov8Cfg):
    if cfg.task == "cls":
        return _apply_cls(params, x, cfg)
    if cfg.variant == "p2":
        feats = _apply_p2(params, x, cfg)
        out, _ = _decode_and_nms(params, feats, x, cfg, (4, 8, 16, 32))
        return out if isinstance(out, dict) else out.as_dict()
    if cfg.variant == "5u":
        feats = _apply_5u_backbone(params, x)
        out, _ = _decode_and_nms(params, feats, x, cfg, (8, 16, 32))
        return out if isinstance(out, dict) else out.as_dict()
    y = B.conv_a(params["m0"], x, stride=2)
    x1 = B.conv_a(params["m1"], y, stride=2)
    return _apply_main_from_x1(params, x1, cfg)


def apply_s2d(params, x4, cfg: Yolov8Cfg):
    """Forward from the 4×4 space-to-depth parity tensor — fused-serving
    fast path for the standard v8 det/seg/pose/obb graph (the two stride-2
    stem convs run as wide-K 2×2 convs; see models/yolo11.py apply_s2d)."""
    if cfg.task == "cls" or cfg.variant in ("p2", "5u"):
        raise ValueError("apply_s2d supports the standard v8 det graph")
    y1 = nn.silu(nn.conv2d_s2d4(
        x4, nn.s2d4_conv_weights(params["m0"]["w"]), params["m0"]["b"]))
    x1 = nn.silu(nn.conv2d_s2d(
        y1, nn.s2d_conv_weights(params["m1"]["w"]), params["m1"]["b"]))
    # P2-stage c2f in phase space (a c2f is a plain-bottleneck c3k2;
    # models/_yolo_blocks.c3k2_s2d_a) — its tiny-channel convs at the
    # largest grid are MXU-starved in planar form
    y = B.c3k2_s2d_a(params["m2"], nn.space_to_depth2(x1), shortcut=True)
    y = nn.silu(nn.conv2d_s2d(
        y, nn.s2d_conv_weights(params["m3"]["w"]), params["m3"]["b"]))
    return _apply_main_from_m3(params, y, cfg)


apply_s2d.factor = 4
apply_s2d.supports = lambda cfg: (cfg.task != "cls"
                                  and cfg.variant not in ("p2", "5u"))


def apply_chain(params, x4, cfg: Yolov8Cfg, ctx, f: int = 2):
    """Int8-resident chain mirror of the v8 det serving path (see
    models/yolo11.apply_chain — same design: s2d stem, f-batch-fold through
    the lane-starved stages, folded P3/P4 heads, every conv int8×int8→int32
    with a fused dequant+bias+SiLU+requant epilogue; ops/qchain.py).

    The reference ships an int8 calibrator for yolov8
    (yolov8/src/calibrator.cpp); this is the chained (int8-resident) tier
    for the same engine. Standard det graph only; requires an even batch
    ≥ 2 (the f=2 fold). `ctx.enter`: "m3" leaves the 160² stem/m2 stage
    bf16 (XLA s8 layout oscillation at small C), "stem" chains everything.
    """
    import tensorrtx_tpu.models._yolo_qchain as Q

    assert cfg.task == "det" and cfg.variant not in ("p2", "5u"), \
        "chained int8 covers the standard v8 det serving path"
    if ctx.enter == "m3":
        xf = nn.batch_fold(x4, f)
        w4, p4s = nn.s2d4_conv_weights(params["m0"]["w"])
        y1 = nn.silu(nn.conv2d_s2d4(xf, (nn.bp_conv_weights(w4, f), p4s),
                                    None)
                     + jnp.tile(jnp.tile(params["m0"]["b"], 4), f))
        w2, p2s = nn.s2d_conv_weights(params["m1"]["w"])
        x1 = nn.silu(nn.conv2d_s2d(y1, (nn.bp_conv_weights(w2, f), p2s),
                                   nn.bp_bias(params["m1"]["b"], f)))
        xfl = B.c2f_a(B.bp_c3k2_p(params["m2"], f), x1, shortcut=True)
        x = ctx.quant_in(xfl)
    else:
        x = ctx.quant_in(nn.batch_fold(x4, f))
        w4, p4s = nn.s2d4_conv_weights(params["m0"]["w"])
        x = ctx.conv(x, nn.bp_conv_weights(w4, f),
                     jnp.tile(jnp.tile(params["m0"]["b"], 4), f),
                     pads=((p4s[0], p4s[1]), (p4s[0], p4s[1])))
        w2, p2s = nn.s2d_conv_weights(params["m1"]["w"])
        x = ctx.conv(x, nn.bp_conv_weights(w2, f),
                     nn.bp_bias(params["m1"]["b"], f),
                     pads=((p2s[0], p2s[1]), (p2s[0], p2s[1])))
        x = Q.qc2f_a(ctx, B.bp_c3k2_p(params["m2"], f), x)
    x = Q.qconv_a(ctx, B.bp_conv_p(params["m3"], f), x, stride=2)
    c4f = Q.qc2f_a(ctx, B.bp_c3k2_p(params["m4"], f), x)
    x = ctx.map_q(Q.qconv_a(ctx, B.bp_conv_p(params["m5"], f), c4f,
                            stride=2),
                  lambda q: nn.batch_unfold(q, f))
    c6 = Q.qc2f_a(ctx, params["m6"], x)
    x = Q.qc2f_a(ctx, params["m8"], Q.qconv_a(ctx, params["m7"], c6,
                                              stride=2))
    p5_in = Q.qsppf_a(ctx, params["m9"], x)
    u = ctx.upsample(p5_in)
    p4m_f = Q.qc2f_a(ctx, B.bp_c3k2_p(params["m12"], f),
                     ctx.map_q(ctx.concat([u, c6]),
                               lambda q: nn.batch_fold(q, f)),
                     shortcut=False)
    uf = ctx.upsample(p4m_f)
    w_u = params["m12"]["cv2"]["w"].shape[-1]
    w_c4 = params["m4"]["cv2"]["w"].shape[-1]
    p3f = Q.qc2f_a(ctx, B.bp_c3k2_p(params["m15"], f,
                                    in_segments=(w_u, w_c4)),
                   ctx.concat([uf, c4f]), shortcut=False)
    xf = Q.qconv_a(ctx, B.bp_conv_p(params["m16"], f), p3f, stride=2)
    w_16 = params["m16"]["w"].shape[-1]
    p4f = Q.qc2f_a(ctx, B.bp_c3k2_p(params["m18"], f,
                                    in_segments=(w_16, w_u)),
                   ctx.concat([xf, p4m_f]), shortcut=False)
    p4 = ctx.map_q(p4f, lambda q: nn.batch_unfold(q, f))
    x = Q.qconv_a(ctx, params["m19"], p4, stride=2)
    p5 = Q.qc2f_a(ctx, params["m21"], ctx.concat([x, p5_in]),
                  shortcut=False)

    h = params["head"]
    b3 = Q.qbranch3_bp(ctx, h["cv2"][0], p3f, f)
    c3 = Q.qbranch3_bp(ctx, h["cv3"][0], p3f, f)
    b4 = Q.qbranch3_bp(ctx, h["cv2"][1], p4f, f)
    c4l = Q.qbranch3_bp(ctx, h["cv3"][1], p4f, f)
    b5 = Q.qbranch3(ctx, h["cv2"][2], p5)
    c5 = Q.qbranch3(ctx, h["cv3"][2], p5)
    box_lv = [nn.batch_unfold(b3, f), nn.batch_unfold(b4, f), b5]
    cls_lv = [nn.batch_unfold(c3, f), nn.batch_unfold(c4l, f), c5]
    from tensorrtx_tpu.models.yolo11 import _decode_det
    return _decode_det(params, box_lv, cls_lv, cfg)


apply_chain.factor = 4
apply_chain.supports = lambda cfg: (cfg.task == "det"
                                    and cfg.variant not in ("p2", "5u"))


def _apply_main_from_x1(params, x1, cfg: Yolov8Cfg):
    y = B.c2f_a(params["m2"], x1, shortcut=True)
    y = B.conv_a(params["m3"], y, stride=2)
    return _apply_main_from_m3(params, y, cfg)


def _apply_main_from_m3(params, y, cfg: Yolov8Cfg):
    c4, y = B.c3k2_down_a(params["m4"], params["m5"], y, shortcut=True)
    c6 = B.c2f_a(params["m6"], y, shortcut=True)
    y = B.conv_a(params["m7"], c6, stride=2)
    y = B.c2f_a(params["m8"], y, shortcut=True)
    p5_in = B.sppf_a(params["m9"], y)
    u = nn.upsample_nearest(p5_in)
    p4_mid = B.c2f_a(params["m12"], jnp.concatenate([u, c6], -1), shortcut=False)
    u = nn.upsample_nearest(p4_mid)
    p3 = B.c2f_a(params["m15"], jnp.concatenate([u, c4], -1), shortcut=False)
    y = B.conv_a(params["m16"], p3, stride=2)
    p4 = B.c2f_a(params["m18"], jnp.concatenate([y, p4_mid], -1), shortcut=False)
    y = B.conv_a(params["m19"], p4, stride=2)
    p5 = B.c2f_a(params["m21"], jnp.concatenate([y, p5_in], -1), shortcut=False)
    feats = [p3, p4, p5]

    out, _ = _decode_and_nms(params, feats, p3, cfg, (8, 16, 32))
    if isinstance(out, dict):  # raw contract
        if cfg.task == "seg":
            out["proto"] = _proto_a(params["proto"], feats[0])
        return out
    if cfg.task == "seg":
        proto = _proto_a(params["proto"], feats[0])
        masks = jax.nn.sigmoid(jnp.einsum("bhwc,bnc->bnhw",
                                          proto.astype(jnp.float32),
                                          out.extras))
        return out.as_dict() | {"masks": masks}
    return out.as_dict()


def _proto_a(pr, f):
    q = B.conv_a(pr["cv1"], f)
    q = nn.silu(nn.conv_transpose2d(q, pr["up_w"], pr["up_b"], stride=2))
    q = B.conv_a(pr["cv2"], q)
    return B.conv_a(pr["cv3"], q)


register(ModelDef(
    name="yolov8",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov8Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    apply_chain=apply_chain,
    doc="YOLOv8 det/seg (reference: yolov8/)",
))
