"""YOLO26: full-graph smoke + NMS-free decode semantics (direct ltrb,
no DFL; top-k selection without suppression)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_yolo26_graph(rng):
    model = get_model("yolo26")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=256,
                              conf_thresh=0.01, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    cfg2 = dataclasses.replace(cfg, postprocess="raw")
    raw = jax.jit(lambda p, x: model.apply(p, x, cfg2))(params, x)
    n = sum((256 // s) ** 2 for s in (8, 16, 32))
    assert raw["boxes"].shape == (1, n, 4)
    assert np.isfinite(np.asarray(raw["boxes"])).all()


def test_yolo26_topk_keeps_overlapping_boxes(rng):
    """NMS-free: two fully-overlapping high-conf candidates BOTH survive
    (contrast with NMS heads) — yolo26/plugin/yololayer.cu top-k semantics."""
    from tensorrtx_tpu.ops.nms import select_topk

    boxes = jnp.asarray([[[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]]],
                        jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.05]], jnp.float32)
    cls = jnp.zeros((1, 3), jnp.float32)
    dets = select_topk(boxes, scores, cls, conf_thresh=0.1, max_det=3)
    s = np.asarray(dets.scores[0])
    assert (s[:2] > 0).all() and s[2] == 0.0
