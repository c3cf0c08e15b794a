"""Planar Pallas conv kernels vs the XLA NHWC reference (interpreter mode —
CPU CI; the same kernels compile for TPU via Mosaic)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.ops import nn as jnn
from tensorrtx_tpu.ops.pallas.conv_planar import (conv1x1_planar,
                                                  conv3x3_planar, from_planar,
                                                  to_planar)


@pytest.mark.fast
@pytest.mark.parametrize("act,res", [("silu", False), ("relu", False),
                                     (None, True)])
def test_conv3x3_planar_matches_xla(rng, act, res):
    B, C, Co, H, W = 2, 8, 16, 16, 16
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    w = rng.normal(0, 0.1, (3, 3, C, Co)).astype(np.float32)
    b = rng.normal(0, 0.1, (Co,)).astype(np.float32)
    r = rng.normal(0, 1, (B, H, Co, W)).astype(np.float32) if res else None
    ref = jnn.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     padding=1)
    if act == "silu":
        ref = jax.nn.silu(ref)
    elif act == "relu":
        ref = jax.nn.relu(ref)
    ref = np.asarray(ref).transpose(0, 1, 3, 2)       # NHWC → planar
    if res:
        ref = ref + r
    got = np.asarray(conv3x3_planar(
        to_planar(jnp.asarray(x)), jnp.asarray(w), jnp.asarray(b),
        residual=jnp.asarray(r) if res else None, act=act, th=8,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.fast
def test_conv1x1_planar_matches_xla(rng):
    B, C, Co, H, W = 2, 16, 8, 16, 16
    x = rng.normal(0, 1, (B, H, W, C)).astype(np.float32)
    w = rng.normal(0, 0.1, (1, 1, C, Co)).astype(np.float32)
    b = rng.normal(0, 0.1, (Co,)).astype(np.float32)
    ref = np.asarray(jax.nn.silu(jnn.conv2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))).transpose(
        0, 1, 3, 2)
    got = np.asarray(conv1x1_planar(
        to_planar(jnp.asarray(x)), jnp.asarray(w), jnp.asarray(b),
        act="silu", th=8, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # roundtrip helpers
    xp = to_planar(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(from_planar(xp)), x)
