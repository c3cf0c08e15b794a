"""NMS + decode op tests against plain-python references implementing the
reference kernels' semantics (postprocess.cu:74-180, postprocess.cpp:100-151)."""

import numpy as np
import jax.numpy as jnp

from tensorrtx_tpu.ops.nms import (box_iou_matrix, nms_greedy, nms_mask,
                                   probiou_matrix, select_and_nms)


def ref_iou(a, b):
    il, it = max(a[0], b[0]), max(a[1], b[1])
    ir, ib = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ir - il, 0.0) * max(ib - it, 0.0)
    if inter == 0:
        return 0.0
    area = lambda x: max(x[2] - x[0], 0) * max(x[3] - x[1], 0)
    return inter / (area(a) + area(b) - inter)


def ref_one_pass(boxes, scores, classes, thresh):
    """GPU kernel semantics: any higher-priority same-class overlap kills."""
    n = len(scores)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i == j or classes[i] != classes[j]:
                continue
            if scores[j] > scores[i] or (scores[j] == scores[i] and j < i):
                if ref_iou(boxes[i], boxes[j]) > thresh:
                    keep[i] = False
                    break
    return keep


def ref_greedy(boxes, scores, classes, thresh):
    """CPU semantics: sequential cascade over score-sorted boxes."""
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(scores), bool)
    for oi, i in enumerate(order):
        if not alive[i]:
            continue
        for j in order[oi + 1:]:
            if alive[j] and classes[i] == classes[j] and ref_iou(boxes[i], boxes[j]) > thresh:
                alive[j] = False
    return alive


def make_boxes(rng, n=64, nc=3):
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    classes = rng.integers(0, nc, n).astype(np.float32)
    return boxes, scores, classes


def test_iou_matrix(rng):
    boxes, _, _ = make_boxes(rng, 32)
    got = np.asarray(box_iou_matrix(jnp.asarray(boxes)))
    for i in range(32):
        for j in range(32):
            assert abs(got[i, j] - ref_iou(boxes[i], boxes[j])) < 1e-5


def test_nms_one_pass_matches_reference_kernel(rng):
    boxes, scores, classes = make_boxes(rng, 128)
    # sort desc like select_and_nms does
    o = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[o], scores[o], classes[o]
    iou = box_iou_matrix(jnp.asarray(boxes))
    keep = np.asarray(nms_mask(iou, jnp.asarray(scores), jnp.asarray(classes),
                               0.45, jnp.ones(128, bool)))
    exp = ref_one_pass(boxes, scores, classes, 0.45)
    np.testing.assert_array_equal(keep, exp)


def test_nms_greedy_matches_cpu_reference(rng):
    boxes, scores, classes = make_boxes(rng, 96)
    o = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[o], scores[o], classes[o]
    iou = box_iou_matrix(jnp.asarray(boxes))
    keep = np.asarray(nms_greedy(iou, jnp.asarray(scores), jnp.asarray(classes),
                                 0.45, jnp.ones(96, bool)))
    exp = ref_greedy(boxes, scores, classes, 0.45)
    np.testing.assert_array_equal(keep, exp)


def test_select_and_nms_end_to_end(rng):
    boxes, scores, classes = make_boxes(rng, 200)
    dets = select_and_nms(jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
                          jnp.asarray(classes)[None], conf_thresh=0.3,
                          iou_thresh=0.45, max_det=64)
    n = int(dets.count[0])
    assert 0 < n <= 64
    v = np.asarray(dets.valid[0])
    assert v[:n].all() and not v[n:].any()
    s = np.asarray(dets.scores[0][:n])
    assert (s >= 0.3).all() and (np.diff(s) <= 1e-7).all()
    # survivors must match the one-pass reference applied to top-64 candidates
    order = np.argsort(-np.where(scores >= 0.3, scores, -1), kind="stable")[:64]
    cb, cs, cc = boxes[order], scores[order], classes[order]
    valid = cs >= 0.3
    exp_keep = ref_one_pass(cb, cs, cc, 0.45) & valid
    exp_set = {tuple(np.round(cb[i], 3)) for i in np.where(exp_keep)[0]}
    got_set = {tuple(np.round(np.asarray(dets.boxes[0][i]), 3)) for i in range(n)}
    assert exp_set == got_set


def test_probiou_symmetry_and_identity(rng):
    n = 16
    obb = np.stack([rng.uniform(0, 100, n), rng.uniform(0, 100, n),
                    rng.uniform(5, 30, n), rng.uniform(5, 30, n),
                    rng.uniform(-np.pi / 4, np.pi / 4, n)], -1).astype(np.float32)
    m = np.asarray(probiou_matrix(jnp.asarray(obb)))
    assert np.allclose(m, m.T, atol=1e-4)
    assert (np.diag(m) > 0.98).all()  # self-IoU ≈ 1
