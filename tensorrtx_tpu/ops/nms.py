"""Fixed-size deterministic NMS for TPU.

The reference has two NMS implementations with slightly different semantics:

- GPU one-pass keep-flag kernel (yolo11/src/postprocess.cu:89-111): box i is
  suppressed if ANY same-class box j with (conf_j > conf_i, or equal conf and
  j before i) overlaps it with IoU > thresh — regardless of whether j itself
  survives. O(n²), no sequential dependency → maps perfectly onto a dense
  vectorized mask reduction on the VPU.
- CPU greedy cascade (yolo11/src/postprocess.cpp:124-151): classic sequential
  greedy NMS (suppressed boxes cannot suppress others).

We implement both: `nms_mask` (one-pass, the fused fast path) and
`nms_greedy` (sequential semantics via lax.fori_loop for exact CPU parity).
Also `probiou` for OBB (postprocess.cu:113-142).

All outputs are fixed-size: (max_det) slots + a count scalar, the same
count-plus-buffer contract the reference uses (kMaxNumOutputBbox).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["box_iou_matrix", "probiou_matrix", "nms_mask", "nms_greedy",
           "select_and_nms", "Detections", "topk_hier"]


def topk_hier(x: Array, k: int, nseg: int = 0) -> Tuple[Array, Array]:
    """Exact top-k via segmented partial sorts (drop-in for lax.top_k).

    On TPU, lax.top_k over a long axis lowers to one full-length variadic
    sort in a 1-sublane layout (~72 µs for 8400 at batch 1). Splitting into
    nseg segments sorts them in parallel across sublanes, then re-top-ks the
    nseg·k survivors: every global top-k element is in its own segment's
    top-k, and concat order (segment-major) preserves lax.top_k's
    lower-index tie-breaking — so values AND indices match bit-exactly.
    Falls back to lax.top_k when the axis doesn't split cleanly.

    nseg=0 (default) picks the deepest clean split with segments ≥
    max(k, 512) — anchor-family heads emit 25200 candidates where the
    fixed 4-way split still left a 6300-long sort (~42 µs/img of the
    yolov5-n batch-1 program) — and re-top-ks long second stages
    recursively.
    """
    n = x.shape[-1]
    if nseg == 0:
        nseg = next((c for c in (16, 12, 8, 6, 4)
                     if n % c == 0 and n // c >= max(k, 512)
                     and c * k < n), 1)
    if nseg == 1 or n % nseg or n // nseg < k:
        return jax.lax.top_k(x, k)
    seg = n // nseg
    xs = x.reshape(*x.shape[:-1], nseg, seg)
    v, i = jax.lax.top_k(xs, k)                          # (..., nseg, k)
    gi = i + (jnp.arange(nseg) * seg)[..., :, None]
    v = v.reshape(*x.shape[:-1], nseg * k)
    gi = gi.reshape(*x.shape[:-1], nseg * k)
    v2, j = (topk_hier(v, k) if nseg * k >= 2048
             else jax.lax.top_k(v, k))
    return v2, jnp.take_along_axis(gi, j, axis=-1)


class Detections(NamedTuple):
    """Fixed-size detection buffer (the TPU analog of [count, Detection...])."""
    boxes: Array    # (B, max_det, 4) xyxy (or cx,cy,w,h for OBB)
    scores: Array   # (B, max_det)
    classes: Array  # (B, max_det) int32
    valid: Array    # (B, max_det) bool
    count: Array    # (B,) int32
    extras: Optional[Array] = None  # (B, max_det, E) mask coeffs / kpts / angle

    def as_dict(self):
        d = self._asdict()
        ex = d.get("extras")
        # vmap turns a None extras field into an empty container; drop it
        if ex is None or (isinstance(ex, (tuple, list)) and len(ex) == 0):
            d.pop("extras")
        return d


def box_iou_matrix(boxes: Array) -> Array:
    """(N,4) xyxy → (N,N) IoU, reference box_iou (postprocess.cu:74-88):
    degenerate boxes clamp to area 0; zero intersection → IoU 0."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    il = jnp.maximum(x1[:, None], x1[None, :])
    it = jnp.maximum(y1[:, None], y1[None, :])
    ir = jnp.minimum(x2[:, None], x2[None, :])
    ib = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ir - il, 0.0) * jnp.maximum(ib - it, 0.0)
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(inter > 0.0, inter / union, 0.0)


def _cov(w, h, r):
    a = w * w / 12.0
    b = h * h / 12.0
    c, s = jnp.cos(r), jnp.sin(r)
    return (a * c * c + b * s * s, a * s * s + b * c * c, (a - b) * s * c)


def probiou_matrix(obb: Array, eps: float = 1e-7) -> Array:
    """(N,5) [cx,cy,w,h,angle] → (N,N) probabilistic IoU for rotated boxes
    (postprocess.cu:113-142, per arXiv:2106.06072)."""
    cx, cy, w, h, r = (obb[:, i] for i in range(5))
    a, b, c = _cov(w, h, r)
    a12 = a[:, None] + a[None, :]
    b12 = b[:, None] + b[None, :]
    c12 = c[:, None] + c[None, :]
    dx = cx[:, None] - cx[None, :]
    dy = cy[:, None] - cy[None, :]
    denom = a12 * b12 - c12 * c12 + eps
    t1 = (a12 * dy * dy + b12 * dx * dx) / denom
    t2 = (c12 * (-dx) * dy) / denom
    det1 = jnp.maximum(a * b - c * c, 0.0)
    t3 = jnp.log((a12 * b12 - c12 * c12)
                 / (4.0 * jnp.sqrt(det1[:, None] * det1[None, :] + eps * eps) + eps) + eps)
    bd = 0.25 * t1 + 0.5 * t2 + 0.5 * t3
    bd = jnp.clip(bd, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    return 1.0 - hd


def nms_mask(iou: Array, scores: Array, classes: Array, iou_thresh: float,
             valid: Array) -> Array:
    """One-pass keep mask (GPU kernel semantics, postprocess.cu:89-111).

    Box i is killed if any valid same-class j with higher priority
    (score_j > score_i, or equal score and j < i) has IoU > thresh.
    """
    n = scores.shape[0]
    same_cls = classes[:, None] == classes[None, :]
    higher = scores[None, :] > scores[:, None]
    idx = jnp.arange(n)
    tie = (scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None])
    dominates = (higher | tie) & same_cls & valid[None, :]
    killed = jnp.any(dominates & (iou > iou_thresh), axis=1)
    return valid & ~killed


def nms_greedy(iou: Array, scores: Array, classes: Array, iou_thresh: float,
               valid: Array) -> Array:
    """Sequential greedy NMS (CPU semantics, postprocess.cpp:124-151).

    Requires rows sorted by descending score. Suppressed boxes cannot
    suppress later boxes. lax.fori_loop over N rows.
    """
    n = scores.shape[0]
    same_cls = classes[:, None] == classes[None, :]
    overlap = (iou > iou_thresh) & same_cls

    def body(i, keep):
        alive = keep[i] & valid[i]
        kill_row = overlap[i] & (jnp.arange(n) > i) & alive
        return keep & ~kill_row

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    return keep & valid


def soft_nms(iou: Array, scores: Array, classes: Array, method: int = 1,
             sigma: float = 0.5, iou_thresh: float = 0.5,
             score_thresh: float = 0.001) -> Array:
    """Soft-NMS (rcnn/BatchedNms.cu nms_method 1=linear, 2=gaussian).

    Sequential over score-sorted rows via fori_loop: each surviving box
    decays the scores of its same-class overlaps instead of killing them.
    Returns the decayed scores (caller re-thresholds / top-ks).
    """
    n = scores.shape[0]
    same = classes[:, None] == classes[None, :]
    later = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) > \
        jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)

    def body(i, sc):
        row_iou = iou[i]
        if method == 2:
            decay = jnp.exp(-jnp.square(row_iou) / sigma)
        else:
            decay = jnp.where(row_iou > iou_thresh, 1.0 - row_iou, 1.0)
        mask = same[i] & later[i]
        factor = jnp.where(mask & (sc[i] > score_thresh), decay, 1.0)
        return sc * factor

    return jax.lax.fori_loop(0, n, body, scores.astype(jnp.float32))


def select_topk(boxes: Array, scores: Array, classes: Array,
                conf_thresh: float, max_det: int,
                extras: Optional[Array] = None) -> Detections:
    """NMS-free selection (yolov10/yolo26 one2one heads,
    yolov10/plugin/yololayer.cu:157, yolo26/plugin/yololayer.cu:178-250):
    confidence gate + top-k, no suppression."""

    def one(bx, sc, cl, ex):
        masked = jnp.where(sc >= conf_thresh, sc, -1.0)
        k = min(max_det, sc.shape[0])
        top_sc, top_i = topk_hier(masked, k)
        valid = top_sc >= conf_thresh
        return Detections(
            boxes=bx[top_i],
            scores=jnp.where(valid, top_sc, 0.0),
            classes=cl[top_i].astype(jnp.int32),
            valid=valid,
            count=jnp.sum(valid).astype(jnp.int32),
            extras=ex[top_i] if ex is not None else None,
        )

    if extras is None:
        return jax.vmap(lambda b, s, c: one(b, s, c, None))(boxes, scores, classes)
    return jax.vmap(one)(boxes, scores, classes, extras)


def select_and_nms(
    boxes: Array,
    scores: Array,
    classes: Array,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int,
    extras: Optional[Array] = None,
    obb: bool = False,
    greedy: bool = False,
    impl: str = "xla",
) -> Detections:
    """Fused candidate selection + NMS, batched.

    boxes (B,N,4) [xyxy; for obb: cx,cy,w,h and extras[...,0] = angle],
    scores (B,N) best-class confidence, classes (B,N).
    Deterministic replacement for atomic-append: mask by conf_thresh,
    lax.top_k to max_det slots, dense O(max_det²) NMS.

    impl: "xla" (default, fuses into the program) or "pallas" (the
    VMEM-tiled kernel in ops/pallas/nms_pallas; identical semantics).
    """

    def one(bx, sc, cl, ex):
        cand = sc >= conf_thresh
        masked = jnp.where(cand, sc, -1.0)
        k = min(max_det, sc.shape[0])
        top_sc, top_i = topk_hier(masked, k)
        top_bx = bx[top_i]
        top_cl = cl[top_i]
        top_ex = ex[top_i] if ex is not None else None
        valid = top_sc >= conf_thresh
        if impl == "pallas" and not obb and not greedy:
            from tensorrtx_tpu.ops.pallas.nms_pallas import nms_mask_pallas

            keep = nms_mask_pallas(top_bx, jnp.where(valid, top_sc, 0.0),
                                   top_cl, iou_thresh)
        else:
            if obb:
                ob = jnp.concatenate([top_bx, top_ex[:, :1]], axis=-1)
                iou = probiou_matrix(ob)
            else:
                iou = box_iou_matrix(top_bx)
            nms_fn = nms_greedy if greedy else nms_mask
            keep = nms_fn(iou, top_sc, top_cl, iou_thresh, valid)
        # compact: stable order by keep (survivors first, score order preserved)
        order = jnp.argsort(~keep, stable=True)
        return Detections(
            boxes=top_bx[order],
            scores=jnp.where(keep, top_sc, 0.0)[order],
            classes=top_cl[order].astype(jnp.int32),
            valid=keep[order],
            count=jnp.sum(keep).astype(jnp.int32),
            extras=top_ex[order] if top_ex is not None else None,
        )

    if extras is None:
        res = jax.vmap(lambda b, s, c: one(b, s, c, None))(boxes, scores, classes)
    else:
        res = jax.vmap(one)(boxes, scores, classes, extras)
    return res
