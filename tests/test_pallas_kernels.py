"""Pallas kernels validated in interpreter mode against the jnp references
(SURVEY.md §5: interpreter mode is the kernel-validation mechanism)."""

import numpy as np
import jax.numpy as jnp

from tensorrtx_tpu.ops.nms import box_iou_matrix, nms_mask
from tensorrtx_tpu.ops.pallas.nms_pallas import nms_mask_pallas
from tensorrtx_tpu.ops.pallas.quantize import quantize_int8
from test_nms import make_boxes


def test_quantize_int8_matches_reference(rng):
    x = rng.normal(0, 2, (3, 50, 17)).astype(np.float32)
    scale = 0.05
    got = np.asarray(quantize_int8(jnp.asarray(x), scale, interpret=True))
    exp = np.clip(np.round(x / scale), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(got, exp)


def test_nms_pallas_matches_jnp(rng):
    boxes, scores, classes = make_boxes(rng, 300)
    o = np.argsort(-scores, kind="stable")
    boxes, scores, classes = boxes[o], scores[o], classes[o]
    # mark a tail of slots invalid like the fixed-size det buffer does
    scores[280:] = 0.0
    iou = box_iou_matrix(jnp.asarray(boxes))
    exp = np.asarray(nms_mask(iou, jnp.asarray(scores), jnp.asarray(classes),
                              0.45, jnp.asarray(scores > 0)))
    got = np.asarray(nms_mask_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(classes), 0.45, interpret=True))
    np.testing.assert_array_equal(got, exp)
