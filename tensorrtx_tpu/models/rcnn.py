"""Faster R-CNN R50-C4 (detectron2) — the reference's hardest graph.

Reference: rcnn/rcnn.cpp (+ backbone.hpp, RpnDecode.cu, RpnNms.cu,
RoiAlign.cu, PredictorDecode.cu, BatchedNms.cu). The detectron2 export fuses
FrozenBN into conv biases, so every conv carries a bias and there are no BN
tensors (backbone.hpp:33-41). Pipeline, all fused into one XLA program:

  stem+res2-4 → RPN head → dense anchor decode (RpnDecode.cu:90-130
  semantics) → top-6000 → NMS 0.7 → top-1000 proposals → RoIAlign 14²
  (ops/roi_align) → res5 → GAP → cls_score/bbox_pred → per-class delta
  decode (weights 10,10,5,5) → score 0.6 gate → class-aware NMS 0.5 →
  top-100 detections.

The cub radix sorts + thrust gathers become lax.top_k; the atomic plugin
buffers become fixed-size tensors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import box_iou_matrix, nms_mask, select_and_nms
from tensorrtx_tpu.ops.roi_align import roi_align_matmul

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
STRIDE = 16


@dataclasses.dataclass
class RcnnCfg:
    variant: str = "resnet50"
    task: str = "det"            # det | mask (Mask R-CNN head)
    num_classes: int = 80
    input_h: int = 480
    input_w: int = 640
    pre_nms_topk: int = 6000
    post_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    score_thresh: float = 0.6
    nms_thresh: float = 0.5
    detections_per_image: int = 100
    pooler_resolution: int = 14


def generate_anchors():
    """rcnn.cpp:62-77: (15, 4) corner offsets around the cell origin."""
    res = []
    for a in ANCHOR_SIZES:
        area = a * a
        for r in ASPECT_RATIOS:
            w = math.sqrt(area / r)
            h = r * w
            res.append([-w / 2, -h / 2, w / 2, h / 2])
    return np.array(res, np.float32)


_BLOCKS = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}


def _conv(wm, name, co, ci, k):
    return wm.conv2d(name, co, ci, (k, k))


def _bottleneck_p(wm, name, cin, mid, cout, shortcut):
    p = {
        "c1": _conv(wm, f"{name}.conv1", mid, cin, 1),
        "c2": _conv(wm, f"{name}.conv2", mid, mid, 3),
        "c3": _conv(wm, f"{name}.conv3", cout, mid, 1),
    }
    if shortcut:
        p["sc"] = _conv(wm, f"{name}.shortcut", cout, cin, 1)
    return p


def _stage_p(wm, name, n, cin, mid, cout):
    return [_bottleneck_p(wm, f"{name}.{i}", cin if i == 0 else cout, mid,
                          cout, i == 0) for i in range(n)]


def build_params(wm, cfg: RcnnCfg):
    blocks = _BLOCKS[cfg.variant]
    p = {
        "stem": _conv(wm, "backbone.stem.conv1", 64, 3, 7),
        "res2": _stage_p(wm, "backbone.res2", blocks[0], 64, 64, 256),
        "res3": _stage_p(wm, "backbone.res3", blocks[1], 256, 128, 512),
        "res4": _stage_p(wm, "backbone.res4", blocks[2], 512, 256, 1024),
        "res5": _stage_p(wm, "roi_heads.res5", blocks[3], 1024, 512, 2048),
        "rpn_conv": _conv(wm, "proposal_generator.rpn_head.conv", 1024, 1024, 3),
        "rpn_logits": _conv(wm, "proposal_generator.rpn_head.objectness_logits",
                            15, 1024, 1),
        "rpn_deltas": _conv(wm, "proposal_generator.rpn_head.anchor_deltas",
                            60, 1024, 1),
        "cls_score": wm.linear("roi_heads.box_predictor.cls_score",
                               cfg.num_classes + 1, 2048),
        "bbox_pred": wm.linear("roi_heads.box_predictor.bbox_pred",
                               cfg.num_classes * 4, 2048),
    }
    if cfg.task == "mask":
        # MaskHead (rcnn.cpp:204-233): shared res5 RoI transform → 2x2
        # deconv + relu → 1x1 predictor; per-det class gather + sigmoid
        # (MaskRcnnInference.cu:8-60)
        dw = wm.tensor("roi_heads.mask_head.deconv.weight", (2048, 256, 2, 2))
        p["mask_deconv"] = {"w": np.transpose(dw, (2, 3, 1, 0)),
                            "b": wm.vec("roi_heads.mask_head.deconv.bias",
                                        256)}
        p["mask_pred"] = _conv(wm, "roi_heads.mask_head.predictor",
                               cfg.num_classes, 256, 1)
    return p


def _bottleneck_a(bp, x, stride):
    # detectron2 stride_in_1x1: the stride sits on conv1
    z = jax.nn.relu(nn.conv2d(x, bp["c1"]["w"], bp["c1"]["b"], stride=stride))
    z = jax.nn.relu(nn.conv2d(z, bp["c2"]["w"], bp["c2"]["b"], padding=1))
    z = nn.conv2d(z, bp["c3"]["w"], bp["c3"]["b"])
    sc = x if "sc" not in bp else nn.conv2d(x, bp["sc"]["w"], bp["sc"]["b"],
                                            stride=stride)
    return jax.nn.relu(z + sc)


def _stage_a(blocks, x, stride):
    for i, bp in enumerate(blocks):
        x = _bottleneck_a(bp, x, stride if i == 0 else 1)
    return x


def _decode_deltas(deltas, boxes, weights):
    """detectron2 Box2BoxTransform.apply_deltas."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    px = deltas[..., 0] / wx * w + cx
    py = deltas[..., 1] / wy * h + cy
    pw = jnp.exp(jnp.minimum(deltas[..., 2] / ww, 10.0)) * w
    ph = jnp.exp(jnp.minimum(deltas[..., 3] / wh, 10.0)) * h
    return jnp.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1)


def apply(params, x, cfg: RcnnCfg):
    """x: (B, H, W, 3), BGR mean-subtracted like the reference driver.
    Returns dict of (B, detections_per_image) scores/boxes/classes."""
    # 7×7 s2 stem as a block conv on the 2×2 s2d input (see
    # models/resnet.backbone_apply stem_s2d — identical numerics, no
    # batch-1 relayout copies)
    y = jax.nn.relu(nn.conv2d_s2d(
        nn.space_to_depth2(x),
        nn.s2d_conv_weights(params["stem"]["w"], padding=3),
        params["stem"]["b"]))
    y = nn.max_pool(y, 3, 2, 1)
    y = _stage_a(params["res2"], y, 1)
    y = _stage_a(params["res3"], y, 2)
    feat = _stage_a(params["res4"], y, 2)          # (B, H/16, W/16, 1024)
    b, fh, fw, _ = feat.shape

    r = jax.nn.relu(nn.conv2d(feat, params["rpn_conv"]["w"],
                              params["rpn_conv"]["b"], padding=1))
    logits = nn.conv2d(r, params["rpn_logits"]["w"], params["rpn_logits"]["b"])
    deltas = nn.conv2d(r, params["rpn_deltas"]["w"], params["rpn_deltas"]["b"])
    logits = logits.reshape(b, fh * fw * 15).astype(jnp.float32)
    deltas = deltas.reshape(b, fh * fw, 15, 4).astype(jnp.float32)

    anchors = jnp.asarray(generate_anchors())      # (15, 4)
    xs = jnp.arange(fw, dtype=jnp.float32) * STRIDE
    ys = jnp.arange(fh, dtype=jnp.float32) * STRIDE
    shift = jnp.stack(
        [jnp.tile(xs, fh), jnp.repeat(ys, fw)], -1)           # (N, 2)
    anc = (anchors[None, :, :] +
           jnp.concatenate([shift, shift], -1)[:, None, :])   # (N, 15, 4)
    boxes_all = _decode_deltas(deltas, anc[None], (1.0, 1.0, 1.0, 1.0))
    boxes_all = jnp.stack([
        jnp.clip(boxes_all[..., 0], 0, cfg.input_w),
        jnp.clip(boxes_all[..., 1], 0, cfg.input_h),
        jnp.clip(boxes_all[..., 2], 0, cfg.input_w),
        jnp.clip(boxes_all[..., 3], 0, cfg.input_h)], -1)
    boxes_all = boxes_all.reshape(b, -1, 4)
    empty = ((boxes_all[..., 2] - boxes_all[..., 0]) <= 0) | \
            ((boxes_all[..., 3] - boxes_all[..., 1]) <= 0)
    scores_all = jnp.where(empty, -jnp.inf, logits)

    k1 = min(cfg.pre_nms_topk, scores_all.shape[1])

    def rpn_one(sc, bx):
        top_sc, top_i = jax.lax.top_k(sc, k1)
        top_bx = bx[top_i]
        iou = box_iou_matrix(top_bx)
        keep = nms_mask(iou, top_sc, jnp.zeros_like(top_sc),
                        cfg.rpn_nms_thresh, jnp.isfinite(top_sc))
        sc2 = jnp.where(keep, top_sc, -jnp.inf)
        _, sel = jax.lax.top_k(sc2, cfg.post_nms_topk)
        return top_bx[sel]

    proposals = jax.vmap(rpn_one)(scores_all, boxes_all)   # (B, P, 4)

    def head_one(f, props):
        pooled = roi_align_matmul(
            f, props, 1.0 / STRIDE,
            (cfg.pooler_resolution, cfg.pooler_resolution), sampling_ratio=2)
        z = pooled
        for i, bp in enumerate(params["res5"]):
            z = _bottleneck_a(bp, z, 2 if i == 0 else 1)
        z = jnp.mean(z, axis=(1, 2))                        # (P, 2048)
        scores = jax.nn.softmax(
            nn.linear(z, params["cls_score"]["w"],
                      params["cls_score"]["b"]).astype(jnp.float32), -1)
        dd = nn.linear(z, params["bbox_pred"]["w"],
                       params["bbox_pred"]["b"]).astype(jnp.float32)
        dd = dd.reshape(-1, cfg.num_classes, 4)
        bx = _decode_deltas(dd, props[:, None, :], (10.0, 10.0, 5.0, 5.0))
        bx = jnp.stack([jnp.clip(bx[..., 0], 0, cfg.input_w),
                        jnp.clip(bx[..., 1], 0, cfg.input_h),
                        jnp.clip(bx[..., 2], 0, cfg.input_w),
                        jnp.clip(bx[..., 3], 0, cfg.input_h)], -1)
        cls_scores = scores[:, :-1]                         # drop background
        best = jnp.argmax(cls_scores, -1)
        best_sc = jnp.max(cls_scores, -1)
        best_bx = jnp.take_along_axis(bx, best[:, None, None].repeat(4, -1),
                                      1)[:, 0]
        return best_bx, best_sc, best.astype(jnp.float32)

    bx, sc, cl = jax.vmap(head_one)(feat, proposals)
    dets = select_and_nms(bx, sc, cl, cfg.score_thresh, cfg.nms_thresh,
                          cfg.detections_per_image)
    if cfg.task != "mask":
        return dets.as_dict()

    def mask_one(f, boxes, classes):
        pooled = roi_align_matmul(
            f, boxes, 1.0 / STRIDE,
            (cfg.pooler_resolution, cfg.pooler_resolution), sampling_ratio=2)
        z = pooled
        for i, bp in enumerate(params["res5"]):
            z = _bottleneck_a(bp, z, 2 if i == 0 else 1)
        z = nn.conv_transpose2d(z, params["mask_deconv"]["w"],
                                params["mask_deconv"]["b"], stride=2)
        z = jax.nn.relu(z)
        logits = nn.conv2d(z, params["mask_pred"]["w"],
                           params["mask_pred"]["b"])  # (D, S, S, nc)
        # per-det class-channel gather (MaskRcnnInference.cu:18-31)
        idx = classes.astype(jnp.int32)[:, None, None, None]
        sel = jnp.take_along_axis(logits, jnp.broadcast_to(
            idx, logits.shape[:3] + (1,)), axis=-1)[..., 0]
        return jax.nn.sigmoid(sel.astype(jnp.float32))  # (D, S, S)

    masks = jax.vmap(mask_one)(feat, dets.boxes, dets.classes)
    return dets.as_dict() | {"masks": masks}


register(ModelDef(
    name="rcnn",
    build_params=build_params,
    apply=apply,
    default_cfg=RcnnCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="Faster R-CNN R50-C4 detectron2 (reference: rcnn/)",
))
