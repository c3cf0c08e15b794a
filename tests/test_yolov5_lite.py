"""YOLOv5-Lite-s smoke + head layout checks."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_yolov5_lite_graph(rng):
    model = get_model("yolov5-lite")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=320,
                              conf_thresh=0.01, max_det=32)
    wm = RandomWeightMap()
    params = jax.tree.map(jnp.asarray, model.build_params(wm, cfg))
    x = rng.uniform(0, 1, (1, 256, 320, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    # anchor count: 3 levels × H/8·W/8 + H/16·W/16 + H/32·W/32 cells × 3
    cfg2 = dataclasses.replace(cfg, postprocess="raw")
    raw = jax.jit(lambda p, x: model.apply(p, x, cfg2))(params, x)
    n = sum((256 // s) * (320 // s) * 3 for s in (8, 16, 32))
    assert raw["boxes"].shape == (1, n, 4)
