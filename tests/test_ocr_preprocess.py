"""PP-OCR preprocess ops: sizes, normalization, parity vs torch resize."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tensorrtx_tpu.ops.ocr_preprocess import (det_normalize, det_target_size,
                                              rec_preprocess,
                                              rec_width_bucket,
                                              resize_bilinear_static)


def test_det_target_size():
    assert det_target_size(1080, 1920, 960) == (544, 960)
    assert det_target_size(480, 640, 960) == (480, 640)
    h, w = det_target_size(33, 47, 960)
    assert h % 32 == 0 and w % 32 == 0 and h >= 32 and w >= 32


def test_resize_matches_torch_bilinear(rng):
    img = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    got = np.asarray(resize_bilinear_static(jnp.asarray(img), 48, 96))
    ref = F.interpolate(torch.from_numpy(img.astype(np.float32)
                                         .transpose(2, 0, 1))[None],
                        size=(48, 96), mode="bilinear",
                        align_corners=False)[0].numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(got, ref, atol=1e-2)


def test_det_normalize_values():
    img = jnp.full((4, 4, 3), 255.0)
    out = np.asarray(det_normalize(img))
    exp = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], exp, rtol=1e-5)


def test_rec_preprocess_pads(rng):
    img = rng.integers(0, 256, (24, 60, 3)).astype(np.uint8)
    out = np.asarray(rec_preprocess(jnp.asarray(img), rec_h=48, max_w=320))
    assert out.shape == (48, 320, 3)
    new_w = round(60 * 48 / 24)
    assert np.abs(out[:, new_w:]).max() == 0          # padded region
    assert np.abs(out[:, :new_w]).max() <= 1.0 + 1e-5  # normalized


def test_rec_width_bucket():
    assert rec_width_bucket(100, 48, 48) == 160
    assert rec_width_bucket(500, 48, 48) == 640
    assert rec_width_bucket(99999, 48, 48) == 3200
