"""YOLOP full-graph smoke (3 outputs: dets + drivable-area + lane masks)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_yolop_three_heads(rng):
    model = get_model("yolop")
    cfg = dataclasses.replace(model.default_cfg(), input_h=192, input_w=320,
                              img_h=176, conf_thresh=0.01, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 192, 320, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    assert out["seg"].shape == (1, 176, 320)
    assert out["lane"].shape == (1, 176, 320)
    assert set(np.unique(np.asarray(out["seg"]))) <= {0, 1}


def test_yolop_focus_slice_order(rng):
    from tensorrtx_tpu.models.yolop import _focus
    import torch

    x = rng.normal(0, 1, (1, 3, 8, 10)).astype(np.float32)
    t = torch.from_numpy(x)
    exp = torch.cat([t[..., ::2, ::2], t[..., 1::2, ::2],
                     t[..., ::2, 1::2], t[..., 1::2, 1::2]], 1).numpy()
    got = np.asarray(_focus(jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    # NHWC slice-major concat == NCHW channel-major per slice group
    got_nchw = np.transpose(got, (0, 3, 1, 2))
    exp_regrouped = exp.reshape(1, 4, 3, 4, 5).reshape(1, 12, 4, 5)
    np.testing.assert_allclose(got_nchw, exp_regrouped, atol=1e-6)