"""YOLO11 (det/seg/pose/obb/cls) — the flagship model.

Reference: yolo11/src/model.cpp (buildEngineYolo11Cls:33, Det:138, Seg:509,
Pose:801, Obb:1092), yolo11/src/block.cpp, yolo11/plugin/yololayer.cu.

TPU-first design: one jitted program takes the letterboxed image batch and
returns a fixed-size detection buffer — backbone, neck, heads, DFL, decode,
top-k and NMS all fuse into a single XLA executable. No host round-trips
between "enqueue" and postprocess like the reference's CUDA pipeline.

Scale multipliers (yolo11_det.cpp:115-160):
  n: gd=.50 gw=.25 maxc=1024 | s: .50/.50/1024 | m: .50/1.0/512
  l: 1.0/1.0/512 | x: 1.0/1.5/512
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


@dataclasses.dataclass
class Yolo11Cfg:
    scale: str = "n"
    task: str = "det"            # det | seg | pose | obb | cls
    num_classes: int = 80        # kNumClass (pose: 1, obb: 15, cls: 1000)
    input_h: int = 640           # obb: 1024; cls: 224
    input_w: int = 640
    conf_thresh: float = 0.5     # kConfThresh
    nms_thresh: float = 0.45     # kNmsThresh
    max_det: int = 300           # NMS buffer slots (reference kMaxNumOutputBbox=1000)
    kpt_conf_thresh: float = 0.5  # kConfThreshKeypoints
    num_kpts: int = 17
    reg_max: int = 16
    postprocess: str = "nms"     # "nms" | "raw" (raw = per-anchor decode inputs)

    @property
    def multipliers(self):
        return SCALES[self.scale]


def _chans(cfg: Yolo11Cfg):
    gd, gw, maxc = cfg.multipliers
    w = lambda x: B.get_width(x, gw, maxc)
    d = lambda x: B.get_depth(x, gd)
    return w, d


# ---------------------------------------------------------------------------
# backbone + neck (shared by all tasks; model indices 0..22)
# ---------------------------------------------------------------------------

def _backbone_p(wm, cfg: Yolo11Cfg):
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
    }
    return p


def _backbone_a(p, x):
    x = B.conv_a(p["m0"], x, stride=2)
    return _backbone_rest_a(p, x)


def _backbone_rest_a(p, x):
    x = B.conv_a(p["m1"], x, stride=2)
    return _backbone_from2_a(p, x)


def _backbone_from2_a(p, x):
    x = B.c3k2_a(p["m2"], x)
    x = B.conv_a(p["m3"], x, stride=2)
    return _backbone_from4_a(p, x)


def _backbone_from4_a(p, x):
    c4, x = B.c3k2_down_a(p["m4"], p["m5"], x)
    return _backbone_from6_a(p, x, c4)


def _backbone_from6_a(p, x, c4):
    c6 = B.c3k2_a(p["m6"], x)
    x = B.conv_a(p["m7"], c6, stride=2)
    x = B.c3k2_a(p["m8"], x)
    return x, c4, c6


def _neck_p(wm, cfg: Yolo11Cfg):
    w, d = _chans(cfg)
    c3k = cfg.scale in ("m", "l", "x")
    return {
        "m9": B.sppf_p(wm, "model.9", w(1024), w(1024)),
        "m10": B.c2psa_p(wm, "model.10", w(1024), w(1024), d(2)),
        "m13": B.c3k2_p(wm, "model.13", w(1024) + w(512), w(512), d(2), c3k, e=0.5),
        "m16": B.c3k2_p(wm, "model.16", w(512) + w(512), w(256), d(2), c3k, e=0.5),
        "m17": B.conv_p(wm, "model.17", w(256), w(256), 3),
        "m19": B.c3k2_p(wm, "model.19", w(256) + w(512), w(512), d(2), c3k, e=0.5),
        "m20": B.conv_p(wm, "model.20", w(512), w(512), 3),
        "m22": B.c3k2_p(wm, "model.22", w(512) + w(1024), w(1024), d(2), True, e=0.5),
    }


def _neck_a(p, x, c4, c6):
    x = B.sppf_a(p["m9"], x)
    p5_in = B.c2psa_a(p["m10"], x)
    u = nn.upsample_nearest(p5_in)
    x = B.c3k2_a(p["m13"], jnp.concatenate([u, c6], axis=-1))
    p4_mid = x
    u = nn.upsample_nearest(x)
    p3 = B.c3k2_a(p["m16"], jnp.concatenate([u, c4], axis=-1))
    x = B.conv_a(p["m17"], p3, stride=2)
    p4 = B.c3k2_a(p["m19"], jnp.concatenate([x, p4_mid], axis=-1))
    x = B.conv_a(p["m20"], p4, stride=2)
    p5 = B.c3k2_a(p["m22"], jnp.concatenate([x, p5_in], axis=-1))
    return p3, p4, p5


# ---------------------------------------------------------------------------
# detect head (model.23 for det; seg/pose/obb add cv4/proto)
# ---------------------------------------------------------------------------

def _det_head_p(wm, cfg: Yolo11Cfg, head: str, nc: int):
    w, _ = _chans(cfg)
    chans = [w(256), w(512), w(1024)]
    c2 = max(16, w(256) // 4, cfg.reg_max * 4)
    c3 = max(w(256), min(nc, 100))
    p: Dict = {"cv2": [], "cv3": []}
    for i, ci in enumerate(chans):
        p["cv2"].append({
            "a": B.conv_p(wm, f"{head}.cv2.{i}.0", ci, c2, 3),
            "b": B.conv_p(wm, f"{head}.cv2.{i}.1", c2, c2, 3),
            "c": wm.conv2d(f"{head}.cv2.{i}.2", cfg.reg_max * 4, c2, (1, 1)),
        })
        p["cv3"].append({
            "a0": B.conv_p(wm, f"{head}.cv3.{i}.0.0", ci, ci, 3, groups=ci),
            "a1": B.conv_p(wm, f"{head}.cv3.{i}.0.1", ci, c3, 1),
            "b0": B.conv_p(wm, f"{head}.cv3.{i}.1.0", c3, c3, 3, groups=c3),
            "b1": B.conv_p(wm, f"{head}.cv3.{i}.1.1", c3, c3, 1),
            "c": wm.conv2d(f"{head}.cv3.{i}.2", nc, c3, (1, 1)),
        })
    return p


def _det_head_a(p, feats, reg_max: int):
    """Per level: cv2 → (B,h,w,4*reg_max) box dist logits; cv3 → class logits."""
    boxes, clss = [], []
    for i, f in enumerate(feats):
        q = p["cv2"][i]
        y = B.conv_a(q["a"], f)
        y = B.conv_a(q["b"], y)
        y = nn.conv2d(y, q["c"]["w"], q["c"]["b"])
        boxes.append(y)
        r = p["cv3"][i]
        z = B.dwconv_a(r["a0"], f)
        z = B.conv_a(r["a1"], z)
        z = B.dwconv_a(r["b0"], z)
        z = B.conv_a(r["b1"], z)
        z = nn.conv2d(z, r["c"]["w"], r["c"]["b"])
        clss.append(z)
    return boxes, clss


def _flatten_levels(levels: List[jax.Array]) -> jax.Array:
    """[(B,h,w,C)] → (B, ΣN, C), level-major row-major like the plugin."""
    b = levels[0].shape[0]
    return jnp.concatenate([lv.reshape(b, -1, lv.shape[-1]) for lv in levels], axis=1)


def _decode_levels(box_lv, cls_lv, reg_max):
    """Per-level DFL + best-class decode, concatenated level-major.

    Identical values/order to flatten-then-decode, but the level concat
    carries 4/1 channels instead of 64/nc — the wide flattens were pure
    relayout time at batch 1. Shared by the anchor-free family."""
    b = box_lv[0].shape[0]
    ltrb = jnp.concatenate(
        [nn.dfl(lv, reg_max).reshape(b, -1, 4) for lv in box_lv], 1)
    cc = [D.best_class(lv) for lv in cls_lv]
    conf = jnp.concatenate([c.reshape(b, -1) for c, _ in cc], 1)
    cls_id = jnp.concatenate([c.reshape(b, -1) for _, c in cc], 1)
    return ltrb, conf, cls_id


# ---------------------------------------------------------------------------
# full models
# ---------------------------------------------------------------------------

def build_params(wm, cfg: Yolo11Cfg):
    if cfg.task == "cls":
        return _build_cls_params(wm, cfg)
    p = {
        "backbone": _backbone_p(wm, cfg),
        "neck": _neck_p(wm, cfg),
    }
    nc = cfg.num_classes
    p["head"] = _det_head_p(wm, cfg, "model.23", nc)
    w, _ = _chans(cfg)
    if cfg.task == "seg":
        c4ch = max(w(256) // 4, 32)
        p["cv4"] = _extra_branch_p(wm, cfg, "model.23.cv4", c4ch, 32)
        p["proto"] = _proto_p(wm, cfg)
    elif cfg.task == "pose":
        kpt_ch = cfg.num_kpts * 3
        c4ch = max(w(256) // 4, kpt_ch)
        p["cv4"] = _extra_branch_p(wm, cfg, "model.23.cv4", c4ch, kpt_ch)
    elif cfg.task == "obb":
        c4ch = max(w(256) // 4, 1)
        p["cv4"] = _extra_branch_p(wm, cfg, "model.23.cv4", c4ch, 1)
    return p


def _extra_branch_p(wm, cfg, name, cmid, cout):
    """seg mask-coeff / pose kpt / obb angle branch: Conv3x3, Conv3x3, 1x1."""
    w, _ = _chans(cfg)
    chans = [w(256), w(512), w(1024)]
    out = []
    for i, ci in enumerate(chans):
        out.append({
            "a": B.conv_p(wm, f"{name}.{i}.0", ci, cmid, 3),
            "b": B.conv_p(wm, f"{name}.{i}.1", cmid, cmid, 3),
            "c": wm.conv2d(f"{name}.{i}.2", cout, cmid, (1, 1)),
        })
    return out


def _extra_branch_a(p, feats):
    outs = []
    for i, f in enumerate(feats):
        y = B.conv_a(p[i]["a"], f)
        y = B.conv_a(p[i]["b"], y)
        y = nn.conv2d(y, p[i]["c"]["w"], p[i]["c"]["b"])
        outs.append(y)
    return outs


def _proto_p(wm, cfg):
    w, _ = _chans(cfg)
    c_ = max(w(256) // 4, 32)
    # upsample is ConvTranspose2d(c_, c_, 2, 2): torch weight (in, out, 2, 2)
    up_w = wm.tensor("model.23.proto.upsample.weight", (c_, c_, 2, 2))
    import numpy as _np

    return {
        "cv1": B.conv_p(wm, "model.23.proto.cv1", w(256), c_, 3),
        "up_w": _np.transpose(up_w, (2, 3, 1, 0)),  # (kh,kw,out,in) for convT
        "up_b": wm.vec("model.23.proto.upsample.bias", c_),
        "cv2": B.conv_p(wm, "model.23.proto.cv2", c_, c_, 3),
        "cv3": B.conv_p(wm, "model.23.proto.cv3", c_, 32, 1),
    }


def _proto_a(p, x):
    y = B.conv_a(p["cv1"], x)
    y = nn.conv_transpose2d(y, p["up_w"], p["up_b"], stride=2)
    y = nn.silu(y)
    y = B.conv_a(p["cv2"], y)
    return B.conv_a(p["cv3"], y)


def apply(params, x, cfg: Yolo11Cfg):
    if cfg.task == "cls":
        return _apply_cls(params, x, cfg)
    feats3 = _backbone_a(params["backbone"], x)
    return _apply_from_feats3(params, feats3, cfg)


def apply_s2d(params, x4, cfg: Yolo11Cfg):
    """Forward from the 4×4 space-to-depth parity tensor (B, H/4, W/4, 48)
    produced by ops.preprocess.letterbox_s2d(factor=4) — the fused-serving
    fast path. The two stride-2 stem convs run as wide-K 2×2 stride-1
    convs (conv2d_s2d4 then conv2d_s2d), skipping the batch-1
    small-channel strided-conv relayout pathology entirely (identical
    numerics; 1029→588 µs/img for YOLO11n-640 on v5e)."""
    if cfg.task == "cls":
        raise ValueError("apply_s2d supports det/seg/pose/obb tasks")
    bb = params["backbone"]
    from tensorrtx_tpu.ops import quant_ctx

    if (16 <= x4.shape[0] < 128 and x4.shape[0] % 2 == 0
            and bb["m5"]["w"].shape[-1] <= 128      # n/s widths only
            and quant_ctx.STATE is None):
        # batch-phase fast path: see _apply_s2d_folded (b32 yolo11n
        # 2648 → 3137 img/s on v5e; exact numerics). At b ≥ 128 XLA
        # already packs the batch into the 128 lanes ({0,3,2,1} layouts,
        # 229 µs/img) and folding regresses it — keep the plain path.
        return _apply_s2d_folded(params, x4, cfg, f=2, f2=2)
    y1 = nn.silu(nn.conv2d_s2d4(
        x4, nn.s2d4_conv_weights(bb["m0"]["w"]), bb["m0"]["b"]))
    x1 = nn.silu(nn.conv2d_s2d(
        y1, nn.s2d_conv_weights(bb["m1"]["w"]), bb["m1"]["b"]))
    if B.c3k2_is_plain(bb["m2"]):
        # P2 stage in phase space: its 8/16-channel convs at the largest
        # grid run at ~3 TF/s planar; as wide-K block convs they use the
        # MXU (exact — see _yolo_blocks.c3k2_s2d_a)
        y2 = B.c3k2_s2d_a(bb["m2"], nn.space_to_depth2(x1))
        x = nn.silu(nn.conv2d_s2d(
            y2, nn.s2d_conv_weights(bb["m3"]["w"]), bb["m3"]["b"]))
        # (2×2-phase m4 measured SLOWER — 4× block-kernel FLOPs at 32ch;
        # the m4 stage instead goes ROW-phase at small batch inside
        # _backbone_from4_a via _yolo_blocks.c3k2_down_a)
        feats3 = _backbone_from4_a(bb, x)
    else:
        feats3 = _backbone_from2_a(bb, x1)
    return _apply_from_feats3(params, feats3, cfg)


def _apply_s2d_folded(params, x4, cfg: Yolo11Cfg, f: int = 4, f2: int = 2):
    """Batch-phase serving path: fold images into the channel dim through
    the lane-starved stem→m5 region (ops/nn.py batch_fold rationale — at
    b≥16 every P1/P2 conv has C ≤ 64 in the 128 MXU lanes; block-diagonal
    weights fill them and cut output rows f×, exact numerics). Measured
    per-stage optima on v5e (fold·C ≈ 128): f=4 for the 16/32-channel
    stem/m2/m3 stages (m2 cv1 at f4 is 4.6× its f2 time), f=2 from m4 on
    (64-channel stages; f4 overshoots 128 lanes and loses). Unfolds at
    the m5 exit where C reaches 128."""
    bb = params["backbone"]
    xf = nn.batch_fold(x4, f)
    w4, p4 = nn.s2d4_conv_weights(bb["m0"]["w"])
    y1 = nn.silu(nn.conv2d_s2d4(xf, (nn.bp_conv_weights(w4, f), p4), None)
                 + jnp.tile(jnp.tile(bb["m0"]["b"], 4), f))
    w2, p2 = nn.s2d_conv_weights(bb["m1"]["w"])
    x1 = nn.silu(nn.conv2d_s2d(y1, (nn.bp_conv_weights(w2, f), p2),
                               nn.bp_bias(bb["m1"]["b"], f)))
    # (deeper inner refolds for m2's 8/16-ch bottlenecks measured SLOWER
    # in-graph: fi=8 2900, fi=4 2944 vs plain f2 3137 img/s — the 160²
    # refold relayouts cost more composed than isolated microbenches show)
    x = B.c3k2_a(B.bp_c3k2_p(bb["m2"], f), x1)
    x = B.conv_a(B.bp_conv_p(bb["m3"], f), x, stride=2)
    if f2 != f:
        x = nn.batch_fold(nn.batch_unfold(x, f), f2)
    c4f = B.c3k2_a(B.bp_c3k2_p(bb["m4"], f2), x)
    x = nn.batch_unfold(
        B.conv_a(B.bp_conv_p(bb["m5"], f2), c4f, stride=2), f2)
    if cfg.task != "det":
        feats3 = _backbone_from6_a(bb, x, nn.batch_unfold(c4f, f2))
        return _apply_from_feats3(params, feats3, cfg)

    # det: stay folded through the lane-starved neck stages and the P3/P4
    # heads (every hidden conv there has C ≤ 64); P5-level ops (C ≥ 256
    # at 20²) run planar.
    c6 = B.c3k2_a(bb["m6"], x)
    x = B.c3k2_a(bb["m8"], B.conv_a(bb["m7"], c6, stride=2))
    p = params["neck"]
    p5_in = B.c2psa_a(p["m10"], B.sppf_a(p["m9"], x))
    u = nn.upsample_nearest(p5_in)
    p4m_f = B.c3k2_a(B.bp_c3k2_p(p["m13"], f2),
                     nn.batch_fold(jnp.concatenate([u, c6], -1), f2))
    uf = nn.upsample_nearest(p4m_f)
    w_u = p["m13"]["cv2"]["w"].shape[-1]      # per-image lateral widths
    w_c4 = bb["m5"]["w"].shape[-1]
    p3f = B.c3k2_a(B.bp_c3k2_p(p["m16"], f2, in_segments=(w_u, w_c4)),
                   jnp.concatenate([uf, c4f], -1))
    xf = B.conv_a(B.bp_conv_p(p["m17"], f2), p3f, stride=2)
    w_17 = p["m17"]["w"].shape[-1]
    p4f = B.c3k2_a(B.bp_c3k2_p(p["m19"], f2, in_segments=(w_17, w_u)),
                   jnp.concatenate([xf, p4m_f], -1))
    p4 = nn.batch_unfold(p4f, f2)
    x = B.conv_a(p["m20"], p4, stride=2)
    p5 = B.c3k2_a(p["m22"], jnp.concatenate([x, p5_in], -1))

    h = params["head"]
    b3, c3 = _det_head_lv_bp(h["cv2"][0], h["cv3"][0], p3f, f2)
    b4, c4l = _det_head_lv_bp(h["cv2"][1], h["cv3"][1], p4f, f2)
    box_lv, cls_lv = _det_head_a(
        {"cv2": h["cv2"][2:], "cv3": h["cv3"][2:]}, [p5], cfg.reg_max)
    box_lv = [nn.batch_unfold(b3, f2), nn.batch_unfold(b4, f2)] + box_lv
    cls_lv = [nn.batch_unfold(c3, f2), nn.batch_unfold(c4l, f2)] + cls_lv
    return _decode_det(params, box_lv, cls_lv, cfg)


def _decode_det(params, box_lv, cls_lv, cfg: Yolo11Cfg):
    """Decode + select + NMS for the plain det task (the folded serving
    path's tail; same ops as _apply_from_feats3's det branch)."""
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det)
    return dets.as_dict()


def _det_head_lv_bp(q, r, ff, f):
    """One detect-head level on a batch-folded feature map (box + cls
    branches, block-diagonal weights; exact _det_head_a numerics)."""
    y = B.conv_a(B.bp_conv_p(q["a"], f), ff)
    y = B.conv_a(B.bp_conv_p(q["b"], f), y)
    box = nn.conv2d(y, nn.bp_conv_weights(q["c"]["w"], f),
                    nn.bp_bias(q["c"]["b"], f))
    z = B.dwconv_a(B.bp_dwconv_p(r["a0"], f), ff)
    z = B.conv_a(B.bp_conv_p(r["a1"], f), z)
    z = B.dwconv_a(B.bp_dwconv_p(r["b0"], f), z)
    z = B.conv_a(B.bp_conv_p(r["b1"], f), z)
    cls = nn.conv2d(z, nn.bp_conv_weights(r["c"]["w"], f),
                    nn.bp_bias(r["c"]["b"], f))
    return box, cls


apply_s2d.factor = 4  # letterbox_s2d factor this entry point consumes
apply_s2d.supports = lambda cfg: cfg.task != "cls"


def apply_chain(params, x4, cfg: Yolo11Cfg, ctx, f: int = 2):
    """Int8-resident chain mirror of `_apply_s2d_folded` (det task).

    Same structure as the bf16 batch-phase serving path — s2d stem, f=2
    batch-fold through the lane-starved stages, C2PSA float island, folded
    P3/P4 heads — but every conv is int8×int8→int32 with a fused
    dequant+bias+SiLU+requant epilogue, and every activation crosses HBM
    as int8 (ops/qchain.py; the TensorRT int8-engine contract,
    yolo11/README.md USE_INT8). `ctx` is an ops.qchain.ChainCtx: tap mode
    runs this same body in float for calibration, run mode serves int8.
    Requires an even batch ≥ 2 (the f=2 fold).
    """
    import tensorrtx_tpu.models._yolo_qchain as Q

    assert cfg.task == "det", "chained int8 covers the det serving path"
    bb = params["backbone"]
    if ctx.enter == "m3":
        # Hybrid entry: the 160² stem/m2 stage stays bf16 (folded) — at
        # small C XLA's s8 layout assignment oscillates between W-minor
        # and C-minor and the s32 accumulator copies eat the int8 gain
        # (trace: ~75 µs/img of s32/s8 copies at 160², PERF.md §INT8) —
        # and the chain starts where C ≥ 64 fills the int8 tiles.
        xf = nn.batch_fold(x4, f)
        w4, p4s = nn.s2d4_conv_weights(bb["m0"]["w"])
        y1 = nn.silu(nn.conv2d_s2d4(xf, (nn.bp_conv_weights(w4, f), p4s),
                                    None)
                     + jnp.tile(jnp.tile(bb["m0"]["b"], 4), f))
        w2, p2s = nn.s2d_conv_weights(bb["m1"]["w"])
        x1 = nn.silu(nn.conv2d_s2d(y1, (nn.bp_conv_weights(w2, f), p2s),
                                   nn.bp_bias(bb["m1"]["b"], f)))
        xfl = B.c3k2_a(B.bp_c3k2_p(bb["m2"], f), x1)
        x = ctx.quant_in(xfl)
    else:
        x = ctx.quant_in(nn.batch_fold(x4, f))
        w4, p4s = nn.s2d4_conv_weights(bb["m0"]["w"])
        x = ctx.conv(x, nn.bp_conv_weights(w4, f),
                     jnp.tile(jnp.tile(bb["m0"]["b"], 4), f),
                     pads=((p4s[0], p4s[1]), (p4s[0], p4s[1])))
        w2, p2s = nn.s2d_conv_weights(bb["m1"]["w"])
        x = ctx.conv(x, nn.bp_conv_weights(w2, f),
                     nn.bp_bias(bb["m1"]["b"], f),
                     pads=((p2s[0], p2s[1]), (p2s[0], p2s[1])))
        x = Q.qc3k2_a(ctx, B.bp_c3k2_p(bb["m2"], f), x)
    x = Q.qconv_a(ctx, B.bp_conv_p(bb["m3"], f), x, stride=2)
    c4f = Q.qc3k2_a(ctx, B.bp_c3k2_p(bb["m4"], f), x)
    x = ctx.map_q(Q.qconv_a(ctx, B.bp_conv_p(bb["m5"], f), c4f, stride=2),
                  lambda q: nn.batch_unfold(q, f))
    c6 = Q.qc3k2_a(ctx, bb["m6"], x)
    x = Q.qc3k2_a(ctx, bb["m8"], Q.qconv_a(ctx, bb["m7"], c6, stride=2))
    p = params["neck"]
    p5_in = Q.qc2psa_a(ctx, p["m10"], Q.qsppf_a(ctx, p["m9"], x))
    u = ctx.upsample(p5_in)
    p4m_f = Q.qc3k2_a(ctx, B.bp_c3k2_p(p["m13"], f),
                      ctx.map_q(ctx.concat([u, c6]),
                                lambda q: nn.batch_fold(q, f)))
    uf = ctx.upsample(p4m_f)
    w_u = p["m13"]["cv2"]["w"].shape[-1]
    w_c4 = bb["m5"]["w"].shape[-1]
    p3f = Q.qc3k2_a(ctx, B.bp_c3k2_p(p["m16"], f, in_segments=(w_u, w_c4)),
                    ctx.concat([uf, c4f]))
    xf = Q.qconv_a(ctx, B.bp_conv_p(p["m17"], f), p3f, stride=2)
    w_17 = p["m17"]["w"].shape[-1]
    p4f = Q.qc3k2_a(ctx, B.bp_c3k2_p(p["m19"], f, in_segments=(w_17, w_u)),
                    ctx.concat([xf, p4m_f]))
    p4 = ctx.map_q(p4f, lambda q: nn.batch_unfold(q, f))
    x = Q.qconv_a(ctx, p["m20"], p4, stride=2)
    p5 = Q.qc3k2_a(ctx, p["m22"], ctx.concat([x, p5_in]))

    h = params["head"]
    b3, c3 = Q.qdet_head_lv_bp(ctx, h["cv2"][0], h["cv3"][0], p3f, f)
    b4, c4l = Q.qdet_head_lv_bp(ctx, h["cv2"][1], h["cv3"][1], p4f, f)
    b5, c5 = Q.qdet_head_lv(ctx, h["cv2"][2], h["cv3"][2], p5)
    box_lv = [nn.batch_unfold(b3, f), nn.batch_unfold(b4, f), b5]
    cls_lv = [nn.batch_unfold(c3, f), nn.batch_unfold(c4l, f), c5]
    return _decode_det(params, box_lv, cls_lv, cfg)


apply_chain.factor = 4
apply_chain.supports = lambda cfg: cfg.task == "det"


def _apply_from_feats3(params, feats3, cfg: Yolo11Cfg):
    p3, p4, p5 = _neck_a(params["neck"], *feats3)
    feats = [p3, p4, p5]
    box_lv, cls_lv = _det_head_a(params["head"], feats, cfg.reg_max)
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)

    strides = (8, 16, 32)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w, strides)

    extras = None
    if cfg.task == "obb":
        ang_raw = _flatten_levels(_extra_branch_a(params["cv4"], feats))[..., 0]
        cx, cy, w_, h_, ang = D.decode_obb(ltrb, ang_raw.astype(jnp.float32),
                                           points, strides_flat)
        boxes = jnp.stack([cx, cy, w_, h_], axis=-1)
        extras = ang[..., None]
    else:
        boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
        if cfg.task == "pose":
            kpt_raw = _flatten_levels(_extra_branch_a(params["cv4"], feats))
            extras = D.decode_pose(kpt_raw.astype(jnp.float32), points,
                                   strides_flat, boxes, cfg.kpt_conf_thresh)
        elif cfg.task == "seg":
            extras = _flatten_levels(_extra_branch_a(params["cv4"], feats))
            extras = extras.astype(jnp.float32)

    if cfg.postprocess == "raw":
        out = {"boxes": boxes, "conf": conf, "cls": cls_id}
        if extras is not None:
            out["extras"] = extras
        if cfg.task == "seg":
            out["proto"] = _proto_a(params["proto"], feats[0])
        return out

    if cfg.postprocess == "nmsfree":
        # one2one-head contract (yolov10 / yolo26): gate + top-k, no NMS
        from tensorrtx_tpu.ops.nms import select_topk

        return select_topk(boxes, conf, cls_id, cfg.conf_thresh,
                           cfg.max_det, extras=extras).as_dict()

    dets = select_and_nms(boxes, conf, cls_id, cfg.conf_thresh, cfg.nms_thresh,
                          cfg.max_det, extras=extras, obb=(cfg.task == "obb"))
    if cfg.task == "seg":
        proto = _proto_a(params["proto"], feats[0])   # (B, H/4, W/4, 32)
        # mask = sigmoid(proto · coeffs) for each kept det (yolo11_seg.cpp:36-60)
        masks = jax.nn.sigmoid(jnp.einsum("bhwc,bnc->bnhw",
                                          proto.astype(jnp.float32),
                                          dets.extras))
        return dets.as_dict() | {"masks": masks}
    return dets.as_dict()


# ---------------------------------------------------------------------------
# classification variant (buildEngineYolo11Cls, model.cpp:33-137)
# ---------------------------------------------------------------------------

def _build_cls_params(wm, cfg: Yolo11Cfg):
    """Cls graph = backbone 0..8, C2PSA at model.9, Classify head at model.10
    (conv1x1→1280, global avg pool, linear; raw logits out) —
    model.cpp:33-137."""
    p = {"backbone": _backbone_p(wm, cfg)}
    w, d = _chans(cfg)
    p["cls_head"] = {
        "m9": B.c2psa_p(wm, "model.9", w(1024), w(1024), d(2)),
        "m10_conv": B.conv_p(wm, "model.10.conv", w(1024), 1280, 1),
        "m10_linear": wm.linear("model.10.linear", cfg.num_classes, 1280),
    }
    return p


def _apply_cls(params, x, cfg: Yolo11Cfg):
    feats, _, _ = _backbone_a(params["backbone"], x)
    n = params["cls_head"]
    y = B.c2psa_a(n["m9"], feats)
    y = B.conv_a(n["m10_conv"], y)
    y = nn.global_avg_pool(y)
    return nn.linear(y, n["m10_linear"]["w"], n["m10_linear"]["b"])


def _default_cfg():
    return Yolo11Cfg()


def _input_shape(cfg: Yolo11Cfg):
    return (cfg.input_h, cfg.input_w, 3)


register(ModelDef(
    name="yolo11",
    build_params=build_params,
    apply=apply,
    default_cfg=_default_cfg,
    input_shape=_input_shape,
    apply_s2d=apply_s2d,
    apply_chain=apply_chain,
    doc="YOLO11 det/seg/pose/obb/cls (reference: yolo11/)",
))
