"""letterbox_mm (separable-matmul) must match the gather reference exactly."""

import numpy as np
import jax.numpy as jnp

from tensorrtx_tpu.ops.preprocess import letterbox, letterbox_mm


def test_letterbox_mm_matches_gather(rng):
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    a = np.asarray(letterbox(jnp.asarray(img), 48, 64, 32, 40))
    b = np.asarray(letterbox_mm(jnp.asarray(img), 48, 64, 32, 40))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_letterbox_mm_padded_bucket(rng):
    img = rng.integers(0, 256, (40, 52, 3)).astype(np.uint8)
    pad = np.zeros((64, 96, 3), np.uint8)
    pad[:40, :52] = img
    a = np.asarray(letterbox_mm(jnp.asarray(img), 40, 52, 32, 32))
    b = np.asarray(letterbox_mm(jnp.asarray(pad), 40, 52, 32, 32))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_letterbox_mm_upscale(rng):
    img = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
    a = np.asarray(letterbox(jnp.asarray(img), 20, 30, 64, 64))
    b = np.asarray(letterbox_mm(jnp.asarray(img), 20, 30, 64, 64))
    np.testing.assert_allclose(a, b, atol=2e-4)
