"""Faster R-CNN components + full-graph smoke."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.models.rcnn import (_decode_deltas, generate_anchors)


def test_generate_anchors_matches_reference():
    got = generate_anchors()
    exp = []
    for a in (32, 64, 128, 256, 512):
        for r in (0.5, 1.0, 2.0):
            w = math.sqrt(a * a / r)
            h = r * w
            exp.append([-w / 2, -h / 2, w / 2, h / 2])
    np.testing.assert_allclose(got, np.array(exp), rtol=1e-6)


def test_decode_deltas_matches_detectron2(rng):
    boxes = np.array([[10, 20, 50, 80], [0, 0, 100, 60]], np.float32)
    deltas = rng.normal(0, 0.3, (2, 4)).astype(np.float32)
    got = np.asarray(_decode_deltas(jnp.asarray(deltas), jnp.asarray(boxes),
                                    (10.0, 10.0, 5.0, 5.0)))
    for i in range(2):
        w = boxes[i, 2] - boxes[i, 0]
        h = boxes[i, 3] - boxes[i, 1]
        cx = boxes[i, 0] + w / 2
        cy = boxes[i, 1] + h / 2
        px = deltas[i, 0] / 10 * w + cx
        py = deltas[i, 1] / 10 * h + cy
        pw = math.exp(deltas[i, 2] / 5) * w
        ph = math.exp(deltas[i, 3] / 5) * h
        np.testing.assert_allclose(
            got[i], [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2],
            rtol=1e-5)


def test_rcnn_full_graph_smoke(rng):
    import dataclasses

    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("rcnn")
    cfg = dataclasses.replace(model.default_cfg(), input_h=128, input_w=160,
                              pre_nms_topk=200, post_nms_topk=50,
                              detections_per_image=20, score_thresh=0.01)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 128, 160, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 20, 4)
    assert out["scores"].shape == (1, 20)
    bx = np.asarray(out["boxes"])
    v = np.asarray(out["valid"])[0]
    if v.any():
        kept = bx[0][v]
        assert (kept[:, 0] >= 0).all() and (kept[:, 2] <= 160 + 1e-3).all()
