"""PP-OCR preprocessing ops (reference: ppocrv5/src/preprocess.cu:65,97).

- det: resize so the long side is `limit` (multiple-of-32 snapped), PP-OCR
  normalization ((x/255 - mean)/std), pad into a static bucket.
- rec: aspect resize to height 48, pad to the width bucket (the TPU answer
  to the reference's rec-width optimization profiles 160..3200).

Both reuse the separable-matmul bilinear resampler (MXU work, not gathers).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tensorrtx_tpu.ops.nn import _bilinear_matrix

PPOCR_MEAN = (0.485, 0.456, 0.406)
PPOCR_STD = (0.229, 0.224, 0.225)


def det_target_size(h: int, w: int, limit: int = 960) -> Tuple[int, int]:
    """Resize-long-side + snap both dims to multiples of 32 (preprocess.cu
    det semantics); host-side helper deciding the static bucket shape."""
    ratio = 1.0 if max(h, w) <= limit else limit / max(h, w)
    nh = max(int(round(h * ratio / 32) * 32), 32)
    nw = max(int(round(w * ratio / 32) * 32), 32)
    return nh, nw


def resize_bilinear_static(img, out_h: int, out_w: int):
    """uint8/float (H, W, C) → (out_h, out_w, C) float32, torch-free bilinear
    (align_corners=False) via constant weight matmuls."""
    h, w, _ = img.shape
    wy = jnp.asarray(_bilinear_matrix(out_h, h, False))
    wx = jnp.asarray(_bilinear_matrix(out_w, w, False))
    x = img.astype(jnp.float32)
    y = jnp.einsum("oh,hwc->owc", wy, x, precision=jax.lax.Precision.HIGH)
    return jnp.einsum("pw,owc->opc", wx, y, precision=jax.lax.Precision.HIGH)


def det_normalize(img) -> jnp.ndarray:
    mean = jnp.asarray(PPOCR_MEAN, jnp.float32)
    std = jnp.asarray(PPOCR_STD, jnp.float32)
    return (img.astype(jnp.float32) / 255.0 - mean) / std


def rec_preprocess(img, rec_h: int = 48, max_w: int = 320):
    """Crop image → (rec_h, max_w, C) normalized, aspect-resized and
    right-padded with zeros (preprocess.cu rec semantics: (x/255-0.5)/0.5)."""
    h, w, c = img.shape
    new_w = min(max(int(round(w * rec_h / h)), 1), max_w)
    resized = resize_bilinear_static(img, rec_h, new_w)
    norm = (resized / 255.0 - 0.5) / 0.5
    pad = jnp.zeros((rec_h, max_w - new_w, c), jnp.float32)
    return jnp.concatenate([norm, pad], axis=1)


def rec_width_bucket(w: int, rec_h: int, img_h: int,
                     buckets=(160, 320, 640, 960, 1280, 3200)) -> int:
    """Pick the smallest static width bucket that fits (the reference's
    optimization-profile range, ppocrv5/src/model.cpp:93-108)."""
    need = int(round(w * rec_h / img_h))
    for b in buckets:
        if need <= b:
            return b
    return buckets[-1]
