"""Host-side image resampling shared by the OCR pipelines.

Matches the reference GPU preprocess convention
(ppocrv5/src/preprocess.cu:65-120): src = (dst + 0.5)·scale − 0.5, clamped
to the source rect, bilinear.
"""

from __future__ import annotations

import numpy as np


def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """img: (H, W[, C]) → (out_h, out_w[, C]) float32, cv2-compatible."""
    h, w = img.shape[:2]
    sy = h / out_h
    sx = w / out_w
    ys = np.clip((np.arange(out_h) + 0.5) * sy - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * sx - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0).astype(np.float32)
    fx = (xs - x0).astype(np.float32)
    im = img.astype(np.float32)
    if im.ndim == 3:
        fy_ = fy[:, None, None]
        fx_ = fx[None, :, None]
    else:
        fy_ = fy[:, None]
        fx_ = fx[None, :]
    top = im[y0][:, x0] * (1 - fx_) + im[y0][:, x1] * fx_
    bot = im[y1][:, x0] * (1 - fx_) + im[y1][:, x1] * fx_
    return top * (1 - fy_) + bot * fy_
