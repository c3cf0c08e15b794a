"""Scaled-YOLOv4 CSP graph smoke (decode semantics shared with yolov5 tests)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_scaled_yolov4_graph(rng):
    model = get_model("scaled-yolov4")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=256,
                              conf_thresh=0.01, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    cfg2 = dataclasses.replace(cfg, postprocess="raw")
    raw = jax.jit(lambda p, x: model.apply(p, x, cfg2))(params, x)
    n = sum((256 // s) ** 2 * 3 for s in (8, 16, 32))
    assert raw["boxes"].shape == (1, n, 4)
    assert np.isfinite(np.asarray(raw["conf"])).all()
