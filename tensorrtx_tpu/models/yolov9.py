"""YOLOv9-c — GELAN backbone (RepNCSPELAN4/ADown) + PGI CBLinear/CBFuse
reversible branch + anchor-free DFL detect.

Reference: yolov9/src/model.cpp:557-729 (build_engine_yolov9_c),
yolov9/src/block.cpp (RepConvN :156, RepNBottleneck :172, RepNCSP :185,
RepNCSPELAN4 :230, ADown :264, CBLinear :292, CBFuse :314, SPPELAN :342,
DualDDetect :424, DFL :376). Decode is the v8 family (DFL distances →
ltrb at anchor points, sigmoid cls), shared via ops.detect / ops.nn.dfl.

Note: the reference's inference graph computes PAN layers model.11-22 but
never feeds them to DualDDetect (model.cpp:574-596 vs :616) — TRT prunes
them as dead code, and we simply don't build them; detection runs on the
reversible-branch outputs model.31/34/37, matching the deployed engine.
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


@dataclasses.dataclass
class Yolov9Cfg:
    scale: str = "c"             # t | s | m | c (t/s/m = converted DDetect)
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    reg_max: int = 16
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    max_det: int = 300
    postprocess: str = "nms"


# Converted (DDetect) t/s/m graphs — build_engine_yolov9_{t,s,m} with
# isConvert=true (model.cpp:25-555). Per scale:
#   stem (c0, c1); first block at model.2 ("elan1" or elan4 spec);
#   3 stages of (down_c, elan(c2, c3, c4, n)); spp (c2, c3);
#   PAN elans m12/m15/m18/m21 + AConv downs m16/m19; head chans.
_CONVERTED = {
    "t": {"stem": (16, 32), "elan1": (32, 32, 16),
          "stages": [(64, (64, 64, 32, 3)), (96, (96, 96, 48, 3)),
                     (128, (128, 128, 64, 3))],
          "spp": (128, 64),
          "m12": (96, 96, 48, 3), "m15": (64, 64, 32, 3), "d16": 48,
          "m18": (96, 96, 48, 3), "d19": 64, "m21": (128, 128, 64, 3),
          "head": (64, 96, 128)},
    "s": {"stem": (32, 64), "elan1": (64, 64, 32),
          "stages": [(128, (128, 128, 64, 3)), (192, (192, 192, 96, 3)),
                     (256, (256, 256, 128, 3))],
          "spp": (256, 128),
          "m12": (192, 192, 96, 3), "m15": (128, 128, 64, 3), "d16": 96,
          "m18": (192, 192, 96, 3), "d19": 128, "m21": (256, 256, 128, 1),
          "head": (128, 192, 256)},
    "m": {"stem": (32, 64), "elan2": (128, 128, 64, 1),
          "stages": [(240, (240, 240, 120, 1)), (360, (360, 360, 180, 1)),
                     (480, (480, 480, 240, 1))],
          "spp": (480, 240),
          "m12": (360, 360, 180, 1), "m15": (240, 240, 120, 1), "d16": 184,
          "m18": (360, 360, 180, 1), "d19": 240, "m21": (480, 480, 240, 1),
          "head": (240, 360, 480)},
}


def _repconvn_p(wm, name, ci, co):
    return {"conv1": B.conv_p(wm, f"{name}.conv1", ci, co, 3),
            "conv2": B.conv_p(wm, f"{name}.conv2", ci, co, 1)}


def _repncsp_p(wm, name, ci, co, n=1):
    c_ = co // 2
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c_, 1),
            "cv2": B.conv_p(wm, f"{name}.cv2", ci, c_, 1),
            "cv3": B.conv_p(wm, f"{name}.cv3", 2 * c_, co, 1),
            "m": [{"cv1": _repconvn_p(wm, f"{name}.m.{i}.cv1", c_, c_),
                   "cv2": B.conv_p(wm, f"{name}.m.{i}.cv2", c_, c_, 3)}
                  for i in range(n)]}


def _elan4_p(wm, name, ci, c2, c3, c4, n=1):
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c3, 1),
            "cv2_0": _repncsp_p(wm, f"{name}.cv2.0", c3 // 2, c4, n),
            "cv2_1": B.conv_p(wm, f"{name}.cv2.1", c4, c4, 3),
            "cv3_0": _repncsp_p(wm, f"{name}.cv3.0", c4, c4, n),
            "cv3_1": B.conv_p(wm, f"{name}.cv3.1", c4, c4, 3),
            "cv4": B.conv_p(wm, f"{name}.cv4", c3 + 2 * c4, c2, 1)}


def _adown_p(wm, name, ci, co):
    c_ = co // 2
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci // 2, c_, 3),
            "cv2": B.conv_p(wm, f"{name}.cv2", ci // 2, c_, 1)}


def _sppelan_p(wm, name, ci, co, c3):
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c3, 1),
            "cv5": B.conv_p(wm, f"{name}.cv5", 4 * c3, co, 1)}


def _elan1_p(wm, name, ci, c2, c3, c4):
    """ELAN1 (block.cpp:208-228): cv1 split + two 3x3 convs + cv4."""
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c3, 1),
            "cv2": B.conv_p(wm, f"{name}.cv2", c3 // 2, c4, 3),
            "cv3": B.conv_p(wm, f"{name}.cv3", c4, c4, 3),
            "cv4": B.conv_p(wm, f"{name}.cv4", c3 + 2 * c4, c2, 1)}


def _elan1_a(ep, x):
    y = B.conv_a(ep["cv1"], x)
    half = y.shape[-1] // 2
    s1, s2 = y[..., :half], y[..., half:]
    y2 = B.conv_a(ep["cv2"], s2)
    y3 = B.conv_a(ep["cv3"], y2)
    return B.conv_a(ep["cv4"], jnp.concatenate([s1, s2, y2, y3], -1))


def _aconv_p(wm, name, ci, co):
    """AConv (block.cpp:256-263): avgpool k2 s1 + 3x3 s2 conv."""
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, co, 3)}


def _aconv_a(ap, x):
    y = nn.avg_pool(x, 2, 1)
    return B.conv_a(ap["cv1"], y, stride=2)


def _head_p(wm, cfg, name, ch):
    nc = cfg.num_classes
    c2 = max(ch[0] // 4, cfg.reg_max * 4)
    c3 = max(ch[0], min(nc, 128))  # DDetect (block.cpp:462)
    head = {"cv2": [], "cv3": []}
    for i, ci in enumerate(ch):
        head["cv2"].append({
            "a": B.conv_p(wm, f"{name}.cv2.{i}.0", ci, c2, 3),
            "b": B.conv_p(wm, f"{name}.cv2.{i}.1", c2, c2, 3, groups=4),
            "c": wm.conv2d(f"{name}.cv2.{i}.2", cfg.reg_max * 4, c2,
                           (1, 1), groups=4),
        })
        head["cv3"].append({
            "a": B.conv_p(wm, f"{name}.cv3.{i}.0", ci, c3, 3),
            "b": B.conv_p(wm, f"{name}.cv3.{i}.1", c3, c3, 3),
            "c": wm.conv2d(f"{name}.cv3.{i}.2", nc, c3, (1, 1)),
        })
    return head


def _build_converted_params(wm, cfg):
    s = _CONVERTED[cfg.scale]
    c0, c1 = s["stem"]
    p = {"m0": B.conv_p(wm, "model.0", 3, c0, 3),
         "m1": B.conv_p(wm, "model.1", c0, c1, 3)}
    if "elan1" in s:
        c2_, c3_, c4_ = s["elan1"]
        p["m2"] = _elan1_p(wm, "model.2", c1, c2_, c3_, c4_)
        cin = c2_
    else:
        c2_, c3_, c4_, n = s["elan2"]
        p["m2"] = _elan4_p(wm, "model.2", c1, c2_, c3_, c4_, n)
        cin = c2_
    for idx, (down_c, (e2, e3, e4, n)) in enumerate(s["stages"]):
        i = 3 + idx * 2
        p[f"m{i}"] = _aconv_p(wm, f"model.{i}", cin, down_c)
        p[f"m{i + 1}"] = _elan4_p(wm, f"model.{i + 1}", down_c, e2, e3, e4, n)
        cin = e2
    spp_c2, spp_c3 = s["spp"]
    p["m9"] = _sppelan_p(wm, "model.9", cin, spp_c2, spp_c3)
    p4_src = s["stages"][1][1][0]
    p3_src = s["stages"][0][1][0]
    p["m12"] = _elan4_p(wm, "model.12", spp_c2 + p4_src, *s["m12"])
    p["m15"] = _elan4_p(wm, "model.15", s["m12"][0] + p3_src, *s["m15"])
    p["m16"] = _aconv_p(wm, "model.16", s["m15"][0], s["d16"])
    p["m18"] = _elan4_p(wm, "model.18", s["d16"] + s["m12"][0], *s["m18"])
    p["m19"] = _aconv_p(wm, "model.19", s["m18"][0], s["d19"])
    p["m21"] = _elan4_p(wm, "model.21", s["d19"] + spp_c2, *s["m21"])
    p["head"] = _head_p(wm, cfg, "model.22", list(s["head"]))
    return p


def _build_e_params(wm, cfg):
    """yolov9-e live subgraph (model.cpp:742-960). DualDDetect model.49
    reads [m35, m32, sppelan_29], all fed from backbone-A, so the PGI
    B-branch (models 10-28) and PAN-B (36-48) are dead code the reference
    engine prunes — we build only the live layers (same graph TRT runs)."""
    p = {
        "m1": B.conv_p(wm, "model.1", 3, 64, 3),
        "m2": B.conv_p(wm, "model.2", 64, 128, 3),
        "e3": _elan4_p(wm, "model.3", 128, 256, 128, 64, 2),
        "a4": _adown_p(wm, "model.4", 256, 256),
        "e5": _elan4_p(wm, "model.5", 256, 512, 256, 128, 2),
        "a6": _adown_p(wm, "model.6", 512, 512),
        "e7": _elan4_p(wm, "model.7", 512, 1024, 512, 256, 2),
        "a8": _adown_p(wm, "model.8", 1024, 1024),
        "e9": _elan4_p(wm, "model.9", 1024, 1024, 512, 256, 2),
        "spp29": _sppelan_p(wm, "model.29", 1024, 512, 256),
        "e32": _elan4_p(wm, "model.32", 1536, 512, 512, 256, 2),
        "e35": _elan4_p(wm, "model.35", 1024, 256, 256, 128, 2),
    }
    p["head"] = _head_p(wm, cfg, "model.49", [256, 512, 512])
    return p


def _apply_e_from_stem(params, y, cfg):
    e5 = _elan4_a(params["e5"], _adown_a(params["a4"],
                                         _elan4_a(params["e3"], y)))
    e7 = _elan4_a(params["e7"], _adown_a(params["a6"], e5))
    spp = _sppelan_a(params["spp29"],
                     _elan4_a(params["e9"], _adown_a(params["a8"], e7)))
    p4 = _elan4_a(params["e32"],
                  jnp.concatenate([nn.upsample_nearest(spp), e7], -1))
    p3 = _elan4_a(params["e35"],
                  jnp.concatenate([nn.upsample_nearest(p4), e5], -1))
    feats = [p3, p4, spp]
    box_lv = [_branch3(params["head"]["cv2"][i], f, groups=4)
              for i, f in enumerate(feats)]
    cls_lv = [_branch3(params["head"]["cv3"][i], f)
              for i, f in enumerate(feats)]
    return _decode_tail(params, box_lv, cls_lv, p3, cfg)


def build_params(wm, cfg: Yolov9Cfg):
    if cfg.scale == "e":
        return _build_e_params(wm, cfg)
    if cfg.scale in _CONVERTED:
        return _build_converted_params(wm, cfg)
    p = {
        "c1": B.conv_p(wm, "model.1", 3, 64, 3),
        "c2": B.conv_p(wm, "model.2", 64, 128, 3),
        "e3": _elan4_p(wm, "model.3", 128, 256, 128, 64),
        "a4": _adown_p(wm, "model.4", 256, 256),
        "e5": _elan4_p(wm, "model.5", 256, 512, 256, 128),
        "a6": _adown_p(wm, "model.6", 512, 512),
        "e7": _elan4_p(wm, "model.7", 512, 512, 512, 256),
        "a8": _adown_p(wm, "model.8", 512, 512),
        "e9": _elan4_p(wm, "model.9", 512, 512, 512, 256),
        "spp10": _sppelan_p(wm, "model.10", 512, 512, 256),
        # reversible branch (PGI)
        "cbl23": wm.conv2d("model.23.conv", 256, 512, (1, 1)),
        "cbl24": wm.conv2d("model.24.conv", 256 + 512, 512, (1, 1)),
        "cbl25": wm.conv2d("model.25.conv", 256 + 512 + 512, 512, (1, 1)),
        "c26": B.conv_p(wm, "model.26", 3, 64, 3),
        "c27": B.conv_p(wm, "model.27", 64, 128, 3),
        "e28": _elan4_p(wm, "model.28", 128, 256, 128, 64),
        "a29": _adown_p(wm, "model.29", 256, 256),
        "e31": _elan4_p(wm, "model.31", 256, 512, 256, 128),
        "a32": _adown_p(wm, "model.32", 512, 512),
        "e34": _elan4_p(wm, "model.34", 512, 512, 512, 256),
        "a35": _adown_p(wm, "model.35", 512, 512),
        "e37": _elan4_p(wm, "model.37", 512, 512, 512, 256),
    }
    ch = (512, 512, 512)
    nc = cfg.num_classes
    c2 = max(ch[0] // 4, cfg.reg_max * 4)
    c3 = max(ch[0], min(nc * 2, 128))
    head = {"cv2": [], "cv3": []}
    for i, ci in enumerate(ch):
        head["cv2"].append({
            "a": B.conv_p(wm, f"model.38.cv2.{i}.0", ci, c2, 3),
            "b": B.conv_p(wm, f"model.38.cv2.{i}.1", c2, c2, 3, groups=4),
            "c": wm.conv2d(f"model.38.cv2.{i}.2", cfg.reg_max * 4, c2,
                           (1, 1), groups=4),  # grouped 1x1 (block.cpp:362)
        })
        head["cv3"].append({
            "a": B.conv_p(wm, f"model.38.cv3.{i}.0", ci, c3, 3),
            "b": B.conv_p(wm, f"model.38.cv3.{i}.1", c3, c3, 3),
            "c": wm.conv2d(f"model.38.cv3.{i}.2", nc, c3, (1, 1)),
        })
    p["head"] = head
    return p


def _repconvn_a(rp, x):
    y = (B.conv_a(rp["conv1"], x, act=False)
         + B.conv_a(rp["conv2"], x, act=False))
    return nn.silu(y)


def _repncsp_a(np_, x):
    y = B.conv_a(np_["cv1"], x)
    for m in np_["m"]:
        h = B.conv_a(m["cv2"], _repconvn_a(m["cv1"], y))
        y = y + h   # shortcut (c1 == c2 always in this family)
    y2 = B.conv_a(np_["cv2"], x)
    return B.conv_a(np_["cv3"], jnp.concatenate([y, y2], -1))


def _elan4_a(ep, x):
    y = B.conv_a(ep["cv1"], x)
    half = y.shape[-1] // 2
    s1, s2 = y[..., :half], y[..., half:]
    y2 = B.conv_a(ep["cv2_1"], _repncsp_a(ep["cv2_0"], s2))
    y3 = B.conv_a(ep["cv3_1"], _repncsp_a(ep["cv3_0"], y2))
    return B.conv_a(ep["cv4"], jnp.concatenate([s1, s2, y2, y3], -1))


def _adown_a(ap, x):
    # avg_pool k2 s1 (shrinks H,W by 1), split channels, two downsample paths
    y = nn.avg_pool(x, 2, 1)
    half = y.shape[-1] // 2
    y1 = B.conv_a(ap["cv1"], y[..., :half], stride=2)
    y2 = B.conv_a(ap["cv2"], nn.max_pool(y[..., half:], 3, 2, 1))
    return jnp.concatenate([y1, y2], -1)


def _sppelan_a(sp, x):
    y = B.conv_a(sp["cv1"], x)
    m1 = nn.max_pool(y, 5, 1, 2)
    m2 = nn.max_pool(m1, 5, 1, 2)
    m3 = nn.max_pool(m2, 5, 1, 2)
    return B.conv_a(sp["cv5"], jnp.concatenate([y, m1, m2, m3], -1))


def _branch3(p, f, groups=1):
    y = B.conv_a(p["a"], f)
    if groups == 1:
        y = B.conv_a(p["b"], y)
        return nn.conv2d(y, p["c"]["w"], p["c"]["b"])
    # grouped head convs run dense block-diagonal: exact, and keeps the
    # group-split layout out of the DFL decode (ops/nn.py
    # dense_grouped_weights)
    wb = nn.dense_grouped_weights(p["b"]["w"], groups)
    y = nn.silu(nn.conv2d(y, wb, p["b"]["b"], padding=wb.shape[0] // 2))
    wc = nn.dense_grouped_weights(p["c"]["w"], groups)
    return nn.conv2d(y, wc, p["c"]["b"])


def _decode_tail(params, box_lv, cls_lv, x, cfg):
    b = x.shape[0]
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


def _apply_converted(params, x, cfg):
    y = B.conv_a(params["m0"], x, stride=2)
    y = B.conv_a(params["m1"], y, stride=2)
    return _apply_converted_from_stem(params, y, cfg)


def _apply_converted_from_stem(params, y, cfg):
    if "cv2_0" in params["m2"]:
        y = _elan4_a(params["m2"], y)
    else:
        y = _elan1_a(params["m2"], y)
    y = _aconv_a(params["m3"], y)
    c4 = _elan4_a(params["m4"], y)
    y = _aconv_a(params["m5"], c4)
    c6 = _elan4_a(params["m6"], y)
    y = _aconv_a(params["m7"], c6)
    y = _elan4_a(params["m8"], y)
    spp = _sppelan_a(params["m9"], y)
    u = nn.upsample_nearest(spp)
    m12 = _elan4_a(params["m12"], jnp.concatenate([u, c6], -1))
    u = nn.upsample_nearest(m12)
    p3 = _elan4_a(params["m15"], jnp.concatenate([u, c4], -1))
    y = _aconv_a(params["m16"], p3)
    p4 = _elan4_a(params["m18"], jnp.concatenate([y, m12], -1))
    y = _aconv_a(params["m19"], p4)
    p5 = _elan4_a(params["m21"], jnp.concatenate([y, spp], -1))
    feats = [p3, p4, p5]
    box_lv = [_branch3(params["head"]["cv2"][i], f, groups=4)
              for i, f in enumerate(feats)]
    cls_lv = [_branch3(params["head"]["cv3"][i], f)
              for i, f in enumerate(feats)]
    return _decode_tail(params, box_lv, cls_lv, y, cfg)


def apply(params, x, cfg: Yolov9Cfg):
    if cfg.scale == "e":
        y = B.conv_a(params["m1"], x, stride=2)
        y = B.conv_a(params["m2"], y, stride=2)
        return _apply_e_from_stem(params, y, cfg)
    if cfg.scale in _CONVERTED:
        return _apply_converted(params, x, cfg)
    y = B.conv_a(params["c1"], x, stride=2)
    x1 = B.conv_a(params["c2"], y, stride=2)
    # PGI auxiliary branch re-reads the raw image through its own stem
    y2 = B.conv_a(params["c26"], x, stride=2)
    x1b = B.conv_a(params["c27"], y2, stride=2)
    return _apply_from_x1(params, x1, x1b, cfg)


def apply_s2d(params, x4, cfg: Yolov9Cfg):
    """Fused-serving fast path from the 4×4 space-to-depth letterbox tensor
    (see models/yolo11.py apply_s2d). Full-pipeline scales: both stems —
    the GELAN main stem and the PGI auxiliary stem — consume the same
    parity tensor. Converted scales (t/s/m): the single 3×3/3×3 stem pair
    takes the same rewrite (their raw-input space-to-batch stem cost
    ~2.4 ms/img of a 2.9 ms yolov9-t on v5e)."""
    if cfg.scale == "e":
        y = B.stem_s2d_a(params["m1"], params["m2"], x4)
        return _apply_e_from_stem(params, y, cfg)
    if cfg.scale in _CONVERTED:
        y = B.stem_s2d_a(params["m0"], params["m1"], x4)
        return _apply_converted_from_stem(params, y, cfg)
    x1 = B.stem_s2d_a(params["c1"], params["c2"], x4)
    x1b = B.stem_s2d_a(params["c26"], params["c27"], x4)
    return _apply_from_x1(params, x1, x1b, cfg)


apply_s2d.factor = 4
apply_s2d.supports = lambda cfg: True


def _qstem(ctx, p0, p1, x4):
    """Chained s2d stem pair (enter="stem"): the two stride-2 stem convs as
    int8 chain convs on the 4×4 parity tensor (see B.stem_s2d_a /
    models/yolo11.apply_chain enter="stem")."""
    x = ctx.quant_in(x4)
    w4, p4s = nn.s2d4_conv_weights(p0["w"])
    x = ctx.conv(x, w4, jnp.tile(p0["b"], 4),
                 pads=((p4s[0], p4s[1]), (p4s[0], p4s[1])))
    w2, p2s = nn.s2d_conv_weights(p1["w"])
    return ctx.conv(x, w2, p1["b"], pads=((p2s[0], p2s[1]), (p2s[0], p2s[1])))


def apply_chain(params, x4, cfg: Yolov9Cfg, ctx, f: int = 1):
    """Int8-resident chain mirror (ops/qchain.py) for the big-C scales —
    c (PGI full graph) and e (live subgraph). The reference's yolov9 int8
    engines are its canonical "int8 is the fastest tier" table
    (yolov9/README.md:42, calibrator at yolov9/src/calibrator.cpp); here
    every GELAN conv is int8×int8→int32 with a fused dequant+bias+SiLU+
    requant epilogue and activations cross HBM as int8. No batch fold:
    C ≥ 256 through the chained region, lanes are already full.

    enter="m3" (default): the stems + the first 160² ELAN stay bf16 (the
    C ≤ 128 large-grid stages hit XLA's s8 layout oscillation, PERF.md
    §INT8) and the chain starts at the 80² ADown where C = 256;
    enter="stem" chains from the s2d stem convs.
    """
    import tensorrtx_tpu.models._yolo_qchain as Q

    assert cfg.scale in ("c", "e"), "chained int8 covers the big-C scales"
    if cfg.scale == "e":
        if ctx.enter == "m3":
            y = B.stem_s2d_a(params["m1"], params["m2"], x4)
            y = ctx.quant_in(_elan4_a(params["e3"], y))
        else:
            y = _qstem(ctx, params["m1"], params["m2"], x4)
            y = Q.qelan4_a(ctx, params["e3"], y)
        e5 = Q.qelan4_a(ctx, params["e5"], Q.qadown_a(ctx, params["a4"], y))
        e7 = Q.qelan4_a(ctx, params["e7"], Q.qadown_a(ctx, params["a6"], e5))
        spp = Q.qsppelan_a(
            ctx, params["spp29"],
            Q.qelan4_a(ctx, params["e9"],
                       Q.qadown_a(ctx, params["a8"], e7)))
        p4 = Q.qelan4_a(ctx, params["e32"],
                        ctx.concat([ctx.upsample(spp), e7]))
        p3 = Q.qelan4_a(ctx, params["e35"],
                        ctx.concat([ctx.upsample(p4), e5]))
        feats = [p3, p4, spp]
    else:
        if ctx.enter == "m3":
            x1 = B.stem_s2d_a(params["c1"], params["c2"], x4)
            x1b = B.stem_s2d_a(params["c26"], params["c27"], x4)
            y3 = ctx.quant_in(_elan4_a(params["e3"], x1))
            y28 = ctx.quant_in(_elan4_a(params["e28"], x1b))
        else:
            y3 = Q.qelan4_a(ctx, params["e3"],
                            _qstem(ctx, params["c1"], params["c2"], x4))
            y28 = Q.qelan4_a(ctx, params["e28"],
                             _qstem(ctx, params["c26"], params["c27"], x4))
        e5 = Q.qelan4_a(ctx, params["e5"], Q.qadown_a(ctx, params["a4"], y3))
        e7 = Q.qelan4_a(ctx, params["e7"], Q.qadown_a(ctx, params["a6"], e5))
        e9 = Q.qelan4_a(ctx, params["e9"], Q.qadown_a(ctx, params["a8"], e7))
        # spp10 feeds only the pruned PAN (module docstring) — not built.
        # CBLinear taps: 1×1 no-act convs, sliced per target level
        cbl23 = ctx.conv(e5, params["cbl23"]["w"], params["cbl23"]["b"],
                         act=None)
        cbl24 = ctx.conv(e7, params["cbl24"]["w"], params["cbl24"]["b"],
                         act=None)
        cbl25 = ctx.conv(e9, params["cbl25"]["w"], params["cbl25"]["b"],
                         act=None)
        s23, = ctx.split(cbl23, (256,))
        s24a, s24b = ctx.split(cbl24, (256, 512))
        s25a, s25b, s25c = ctx.split(cbl25, (256, 512, 512))
        a29 = Q.qadown_a(ctx, params["a29"], y28)
        # CBFuse: upsample each tap to the base level and sum
        f30 = ctx.add_n([a29, s23, ctx.upsample(s24a, 2),
                         ctx.upsample(s25a, 4)])
        p3 = Q.qelan4_a(ctx, params["e31"], f30)
        a32 = Q.qadown_a(ctx, params["a32"], p3)
        f33 = ctx.add_n([a32, s24b, ctx.upsample(s25b, 2)])
        p4 = Q.qelan4_a(ctx, params["e34"], f33)
        a35 = Q.qadown_a(ctx, params["a35"], p4)
        f36 = ctx.add_n([a35, s25c])
        p5 = Q.qelan4_a(ctx, params["e37"], f36)
        feats = [p3, p4, p5]
    h = params["head"]
    box_lv = [Q.qbranch3_grouped(ctx, h["cv2"][i], ff, groups=4)
              for i, ff in enumerate(feats)]
    cls_lv = []
    for i, ff in enumerate(feats):
        r = h["cv3"][i]
        z = Q.qconv_a(ctx, r["a"], ff)
        z = Q.qconv_a(ctx, r["b"], z)
        cls_lv.append(ctx.conv_out(z, r["c"]["w"], r["c"]["b"]))
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


apply_chain.factor = 4
apply_chain.folds = (1,)
apply_chain.supports = lambda cfg: cfg.scale in ("c", "e")


def _apply_from_x1(params, x1, x1b, cfg: Yolov9Cfg):
    y = _elan4_a(params["e3"], x1)
    y = _adown_a(params["a4"], y)
    e5 = _elan4_a(params["e5"], y)
    y = _adown_a(params["a6"], e5)
    e7 = _elan4_a(params["e7"], y)
    y = _adown_a(params["a8"], e7)
    e9 = _elan4_a(params["e9"], y)
    spp = _sppelan_a(params["spp10"], e9)
    del spp  # only feeds the pruned PAN (see module docstring)

    # CBLinear taps: one 1x1 conv per scale, outputs split per target level
    cbl23 = nn.conv2d(e5, params["cbl23"]["w"], params["cbl23"]["b"])
    cbl24 = nn.conv2d(e7, params["cbl24"]["w"], params["cbl24"]["b"])
    cbl25 = nn.conv2d(e9, params["cbl25"]["w"], params["cbl25"]["b"])

    y = _elan4_a(params["e28"], x1b)
    a29 = _adown_a(params["a29"], y)
    # CBFuse: upsample each tap to the base level and sum (block.cpp:314-341)
    f30 = (a29 + cbl23[..., :256]
           + nn.upsample_nearest(cbl24[..., :256], 2)
           + nn.upsample_nearest(cbl25[..., :256], 4))
    p3 = _elan4_a(params["e31"], f30)
    a32 = _adown_a(params["a32"], p3)
    f33 = (a32 + cbl24[..., 256:768]
           + nn.upsample_nearest(cbl25[..., 256:768], 2))
    p4 = _elan4_a(params["e34"], f33)
    a35 = _adown_a(params["a35"], p4)
    f36 = a35 + cbl25[..., 768:1280]
    p5 = _elan4_a(params["e37"], f36)

    feats = [p3, p4, p5]
    box_lv = [_branch3(params["head"]["cv2"][i], f, groups=4)
              for i, f in enumerate(feats)]
    cls_lv = [_branch3(params["head"]["cv3"][i], f)
              for i, f in enumerate(feats)]
    b = x1.shape[0]
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="yolov9",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov9Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    apply_chain=apply_chain,
    doc="YOLOv9-c, GELAN + PGI reversible branch (reference: yolov9/)",
))
