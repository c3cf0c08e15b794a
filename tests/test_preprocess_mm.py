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


def test_letterbox_s2d_matches_full_res_oracle(rng):
    """letterbox_s2d (stacked parity-plane einsums) must equal letterbox_mm
    followed by an explicit space-to-depth rearrange, across source sizes
    and both s2d factors."""
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d

    img = jnp.asarray(rng.integers(0, 256, (128, 128, 3)), jnp.uint8)
    for (sh, sw) in [(128, 128), (96, 128), (128, 72), (33, 57), (128, 1)]:
        for f in (2, 4):
            out = np.asarray(letterbox_s2d(img, sh, sw, 128, 128, factor=f,
                                           out_dtype=jnp.float32))
            ref_full = np.asarray(letterbox_mm(
                img.astype(jnp.float32), sh, sw, 128, 128))
            rf = ref_full.reshape(128 // f, f, 128 // f, f, 3)
            rf = rf.transpose(0, 2, 1, 3, 4).reshape(128 // f, 128 // f, -1)
            np.testing.assert_allclose(out, rf, atol=1e-3,
                                       err_msg=f"src {sh}x{sw} f{f}")
