"""Bilinear grid sampling (UVDoc document unwarp).

Equivalent of TensorRT IGridSampleLayer with LINEAR interpolation,
align_corners=True and FILL (zero) out-of-range handling
(reference: ppocrv5/src/model.cpp:1987-1994).

TPU-first formulation: the gather is expressed as one flat take over the
(H*W) plane with per-corner weights; XLA lowers this to a vectorized gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(x, grid, align_corners: bool = True):
    """x: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized [-1, 1] (x, y).

    Returns (B, Ho, Wo, C); out-of-range samples contribute 0 (FILL).
    """
    b, h, w, c = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1.0) * 0.5 * (w - 1)
        py = (gy + 1.0) * 0.5 * (h - 1)
    else:
        px = (gx + 1.0) * 0.5 * w - 0.5
        py = (gy + 1.0) * 0.5 * h - 0.5

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = (px - x0).astype(x.dtype)
    wy1 = (py - y0).astype(x.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = x.reshape(b, h * w, c)

    def corner(xi, yi, wgt):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1).reshape(*idx.shape, c)
        return vals * (wgt * valid.astype(x.dtype))[..., None]

    out = (corner(x0i, y0i, wx0 * wy0) + corner(x0i + 1, y0i, wx1 * wy0)
           + corner(x0i, y0i + 1, wx0 * wy1)
           + corner(x0i + 1, y0i + 1, wx1 * wy1))
    return out
