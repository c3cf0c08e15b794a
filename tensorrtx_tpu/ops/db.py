"""DB (Differentiable Binarization) postprocess — host-side geometry.

Reference: ppocrv5/src/postprocess.cpp:10-160 and dbnet/ (which embeds the
4.6k-line Clipper library for polygon offsetting). The geometry is inherently
host-side (SURVEY.md §7 hard parts); here it is pure numpy + scipy:
connected components → convex hull → rotating-calipers min-area rect →
box score → unclip (rect offset by area·ratio/perimeter) → 4-point boxes.
"""

from __future__ import annotations

import math
from typing import List, Tuple

import numpy as np

try:
    from scipy import ndimage
except ImportError:  # pragma: no cover
    ndimage = None

__all__ = ["convex_hull", "min_area_rect", "db_boxes_from_prob",
           "order_points_clockwise"]


def order_points_clockwise(box: np.ndarray) -> np.ndarray:
    """Canonical [tl, tr, br, bl] corner order (the reference's
    OrderPointsClockwise, ppocrv5/src/postprocess.cpp) — rotate_crop and
    every downstream consumer assume corner 0 is the text's top-left, and
    the min-area-rect corner cycle is otherwise tie-dependent."""
    idx = np.argsort(box[:, 0], kind="stable")
    left, right = box[idx[:2]], box[idx[2:]]
    tl, bl = left[np.argsort(left[:, 1], kind="stable")]
    tr, br = right[np.argsort(right[:, 1], kind="stable")]
    return np.stack([tl, tr, br, bl]).astype(np.float32)


def convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; pts (N,2) → hull (M,2) counter-clockwise."""
    pts = np.unique(pts, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(iterable):
        out = []
        for p in iterable:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def min_area_rect(pts: np.ndarray):
    """Minimum-area bounding rectangle (cv::minAreaRect analog).

    Returns (center (2,), (w, h), angle_rad) via rotating calipers over the
    convex hull edges."""
    hull = convex_hull(pts.astype(np.float64))
    if len(hull) == 1:
        return hull[0], (0.0, 0.0), 0.0
    if len(hull) == 2:
        c = hull.mean(0)
        d = hull[1] - hull[0]
        return c, (float(np.hypot(*d)), 0.0), math.atan2(d[1], d[0])
    best = None
    n = len(hull)
    for i in range(n):
        e = hull[(i + 1) % n] - hull[i]
        theta = math.atan2(e[1], e[0])
        c, s = math.cos(-theta), math.sin(-theta)
        rot = hull @ np.array([[c, -s], [s, c]]).T
        x1, y1 = rot.min(0)
        x2, y2 = rot.max(0)
        area = (x2 - x1) * (y2 - y1)
        if best is None or area < best[0]:
            cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
            center = np.array([cx * c + cy * s, -cx * s + cy * c])
            best = (area, center, (x2 - x1, y2 - y1), theta)
    _, center, (w, h), theta = best
    return center, (float(w), float(h)), theta


def _rect_points(center, size, theta):
    w, h = size
    c, s = math.cos(theta), math.sin(theta)
    dx = np.array([c, s]) * w / 2
    dy = np.array([-s, c]) * h / 2
    return np.array([center - dx - dy, center + dx - dy,
                     center + dx + dy, center - dx + dy], np.float32)


def db_boxes_from_prob(prob: np.ndarray, bin_thresh: float = 0.3,
                       box_thresh: float = 0.7, unclip_ratio: float = 1.5,
                       max_candidates: int = 1000, min_size: int = 3,
                       native: bool = True):
    """prob (H, W) float → list of (box (4,2) float32, score).

    Box = unclipped min-area rect of each connected component of the
    binarized map, scored by the mean probability inside the component.
    Runs the C++ implementation (native/db_postprocess.cc — the runtime
    analog of the reference's OpenCV+Clipper postprocess) when the
    toolchain is available; this numpy path is the portable fallback and
    the parity oracle (tests/test_native_db.py).
    """
    if native:
        try:
            from tensorrtx_tpu.native import db_native
            return [(order_points_clockwise(b), s)
                    for b, s in db_native.db_boxes_from_prob(
                        prob, bin_thresh, box_thresh, unclip_ratio,
                        max_candidates, min_size)]
        except ImportError:
            pass
    if ndimage is None:
        raise RuntimeError("scipy required for DB postprocess")
    binmap = prob > bin_thresh
    labels, nlab = ndimage.label(binmap)
    boxes = []
    objs = ndimage.find_objects(labels)
    for li, sl in enumerate(objs[:max_candidates], start=1):
        if sl is None:
            continue
        mask = labels[sl] == li
        ys, xs = np.nonzero(mask)
        if len(xs) < min_size:
            continue
        pts = np.stack([xs + sl[1].start, ys + sl[0].start], axis=1)
        center, (w, h), theta = min_area_rect(pts + 0.5)
        if min(w, h) < min_size:
            continue
        score = float(prob[sl][mask].mean())
        if score < box_thresh:
            continue
        # unclip: offset distance = area * ratio / perimeter (Clipper analog
        # for rectangles: grow both dims by 2*delta)
        area = w * h
        perim = 2 * (w + h)
        delta = area * unclip_ratio / max(perim, 1e-6)
        box = _rect_points(center, (w + 2 * delta, h + 2 * delta), theta)
        h_img, w_img = prob.shape
        box[:, 0] = np.clip(box[:, 0], 0, w_img)
        box[:, 1] = np.clip(box[:, 1], 0, h_img)
        boxes.append((order_points_clockwise(box), score))
    return boxes
