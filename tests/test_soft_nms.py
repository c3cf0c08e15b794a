"""Soft-NMS vs a scalar reference of the BatchedNms.cu soft paths."""

import numpy as np
import jax.numpy as jnp

from tensorrtx_tpu.ops.nms import box_iou_matrix, soft_nms
from test_nms import make_boxes, ref_iou


def ref_soft_nms(boxes, scores, classes, method, sigma=0.5, thresh=0.5,
                 score_thresh=0.001):
    sc = scores.astype(np.float64).copy()
    n = len(sc)
    for i in range(n):
        if sc[i] <= score_thresh:
            continue
        for j in range(i + 1, n):
            if classes[i] != classes[j]:
                continue
            iou = ref_iou(boxes[i], boxes[j])
            if method == 2:
                sc[j] *= np.exp(-iou * iou / sigma)
            elif iou > thresh:
                sc[j] *= 1.0 - iou
    return sc


def test_soft_nms_linear_and_gaussian(rng):
    boxes, scores, classes = make_boxes(rng, 64)
    o = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[o], scores[o], classes[o]
    iou = box_iou_matrix(jnp.asarray(boxes))
    for method in (1, 2):
        got = np.asarray(soft_nms(iou, jnp.asarray(scores),
                                  jnp.asarray(classes), method=method))
        exp = ref_soft_nms(boxes, scores, classes, method)
        np.testing.assert_allclose(got, exp, rtol=1e-4)
