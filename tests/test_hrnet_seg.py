"""HRNetV2 seg: full-graph smoke (module machinery is parity-tested via
the classification hrnet; seg differs in bilinear fuse + head)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_hrnet_seg_graph(rng):
    model = get_model("hrnet-seg")
    cfg = dataclasses.replace(model.default_cfg(), input_h=128, input_w=256,
                              num_classes=7)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 128, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 128, 256)
    o = np.asarray(out)
    assert o.dtype == np.int32 and o.min() >= 0 and o.max() < 7
