"""PSENet: progressive-scale-expansion reference test + graph smoke."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_pse_expand_bfs_semantics():
    """Two seeds in the smallest kernel expand through growing kernels
    without crossing into each other (psenet.cpp:361-440 BFS)."""
    from tensorrtx_tpu.models.psenet import pse_expand

    h = w = 12
    k = np.zeros((h, w, 3), np.uint8)
    k[2, 2, 0] = 1                # seed A
    k[2, 9, 0] = 1                # seed B
    k[1:4, 1:11, 1] = 1           # bridge row at level 1
    k[:, :, 2] = 1                # full image at level 2
    out = pse_expand(k)
    a, b = out[2, 2], out[2, 9]
    assert a != 0 and b != 0 and a != b
    # expansion filled the level-1 bridge, split between the two seeds
    assert out[2, 4] == a and out[2, 7] == b
    # level-2 fills everything, still two distinct regions
    assert set(np.unique(out)) == {0, a, b} or set(np.unique(out)) == {a, b}
    assert (out[5:, :] > 0).all()


def test_psenet_graph(rng):
    model = get_model("psenet")
    cfg = dataclasses.replace(model.default_cfg(), input_h=192, input_w=192)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 192, 192, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 48, 48, 6)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    boxes = model.postprocess(out, cfg)[0]
    assert isinstance(boxes, list)
