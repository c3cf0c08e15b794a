"""Catalog variant tail: mobilenetv3-large, ibnnet-b, inceptionv4,
ghostnetv2, arcface-mobilefacenet, real-esrgan-x4v3."""

import dataclasses

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


CASES = [
    ("mobilenetv3", {"variant": "large"}, (1, 224, 224, 3), (1, 1000)),
    ("ibnnet", {"variant": "b"}, (1, 224, 224, 3), (1, 1000)),
    ("inceptionv4", {}, (1, 299, 299, 3), (1, 1000)),
    ("ghostnetv2", {}, (1, 224, 224, 3), (1, 1000)),
    ("arcface-mobilefacenet", {}, (1, 112, 112, 3), (1, 128)),
    ("real-esrgan-x4v3", {"input_h": 64, "input_w": 64}, (1, 64, 64, 3),
     (1, 256, 256, 3)),
]


@pytest.mark.parametrize("name,kw,ishape,oshape", CASES)
def test_variant_tail_graphs(rng, name, kw, ishape, oshape):
    m = get_model(name)
    cfg = dataclasses.replace(m.default_cfg(), **kw) if kw else m.default_cfg()
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, ishape).astype(np.float32)
    out = jax.jit(lambda p, v: m.apply(p, v, cfg))(params, x)
    assert out.shape == oshape
    assert np.isfinite(np.asarray(out)).all()


def test_x4v3_residual_is_nearest_upsample(rng):
    """Output = pixel-shuffled conv stack + nearest-upsampled input
    (main.cpp:121-131): with zero conv_last weights, out == up(x)."""
    from tensorrtx_tpu.core.params import WeightMap
    from tensorrtx_tpu.models.real_esrgan import (EsrganX4v3Cfg,
                                                  build_x4v3_params,
                                                  x4v3_apply)

    cfg = EsrganX4v3Cfg(num_conv=1, input_h=8, input_w=8)
    raw = {}
    for i in range(2):
        raw[f"body.{2*i}.weight"] = rng.normal(
            0, 0.1, (64, 3 if i == 0 else 64, 3, 3)).astype(np.float32).ravel()
        raw[f"body.{2*i}.bias"] = np.zeros(64, np.float32)
        raw[f"body.{2*i+1}.weight"] = rng.uniform(0, 0.3, 64).astype(
            np.float32)
    raw["body.4.weight"] = np.zeros((48, 64, 3, 3), np.float32).ravel()
    raw["body.4.bias"] = np.zeros(48, np.float32)
    params = jax.tree.map(jnp.asarray,
                          build_x4v3_params(WeightMap(raw), cfg))
    x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(x4v3_apply(params, jnp.asarray(x), cfg))
    exp = np.asarray(x).repeat(4, 1).repeat(4, 2)
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_mobilefacenet_embedding_distinguishes_inputs(rng):
    m = get_model("arcface-mobilefacenet")
    cfg = m.default_cfg()
    params = jax.tree.map(jnp.asarray, m.build_params(RandomWeightMap(), cfg))
    fn = jax.jit(lambda p, v: m.apply(p, v, cfg))
    a = fn(params, rng.normal(0, 1, (1, 112, 112, 3)).astype(np.float32))
    b = fn(params, rng.normal(0, 1, (1, 112, 112, 3)).astype(np.float32))
    from tensorrtx_tpu.models.arcface import cosine_similarity

    assert abs(cosine_similarity(a, a) - 1.0) < 1e-5
    # 0.05-std random weights attenuate the input signal to ~1e-5 through
    # 50+ residual-free convs; it must still be nonzero (input propagates)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
