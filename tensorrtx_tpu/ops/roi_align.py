"""RoIAlign — detectron2-exact bilinear ROI pooling.

Reference: rcnn/RoiAlign.cu:83-175 (CUDA kernel adapted from NV
retinanet-examples). TPU formulation: for static (pooled_h, pooled_w,
sampling_ratio), each output cell's sample coordinates are computed densely
and fetched with one vectorized gather per corner — no scalar loops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["roi_align", "roi_align_matmul"]


def _bilinear_gather(feat: Array, ys: Array, xs: Array) -> Array:
    """feat (H, W, C); ys/xs (...,) → (..., C), detectron2 border handling:
    clamp coords into [0, H-1]/[0, W-1], zero outside [-1, H)/( -1, W)."""
    h, w, _ = feat.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1)
    x = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("pooled", "sampling_ratio",
                                             "aligned"))
def roi_align(feat: Array, rois: Array, spatial_scale: float,
              pooled: Tuple[int, int] = (7, 7), sampling_ratio: int = 2,
              aligned: bool = False) -> Array:
    """feat (H, W, C), rois (N, 4) xyxy in image coords →
    (N, ph, pw, C) averaged bilinear samples (RoiAlign.cu semantics:
    roi scaled by spatial_scale, each bin sampled sampling_ratio² times)."""
    ph, pw = pooled
    sr = sampling_ratio
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - off
    y1 = rois[:, 1] * spatial_scale - off
    x2 = rois[:, 2] * spatial_scale - off
    y2 = rois[:, 3] * spatial_scale - off
    rw = jnp.maximum(x2 - x1, 1.0 if not aligned else 1e-6)
    rh = jnp.maximum(y2 - y1, 1.0 if not aligned else 1e-6)
    bin_h = rh / ph   # (N,)
    bin_w = rw / pw

    iy = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr   # (sr,)
    by = jnp.arange(ph, dtype=jnp.float32)                # (ph,)
    bx = jnp.arange(pw, dtype=jnp.float32)
    # sample grid per roi: (N, ph, sr) y coords, (N, pw, sr) x coords
    ys = (y1[:, None, None] + (by[None, :, None] + iy[None, None, :])
          * bin_h[:, None, None])
    xs = (x1[:, None, None] + (bx[None, :, None] + iy[None, None, :])
          * bin_w[:, None, None])
    # full (N, ph, sr, pw, sr) coordinate lattice
    n = rois.shape[0]
    Y = jnp.broadcast_to(ys[:, :, :, None, None], (n, ph, sr, pw, sr))
    X = jnp.broadcast_to(xs[:, None, None, :, :], (n, ph, sr, pw, sr))
    samples = _bilinear_gather(feat, Y.reshape(-1), X.reshape(-1))
    c = feat.shape[-1]
    samples = samples.reshape(n, ph, sr, pw, sr, c)
    return samples.mean(axis=(2, 4))


def _interp_matrix(starts: Array, bin_sizes: Array, n_bins: int, sr: int,
                   size: int) -> Array:
    """(N,) roi starts/bin sizes → (N, n_bins, size) bilinear row weights.

    Each output bin averages ``sr`` bilinear samples; bilinearity lets the
    sample mean fold into the weights, so row k of the result applied to a
    length-``size`` axis reproduces mean_s(bilinear(start + (k+(s+.5)/sr)*bin))
    exactly — including the detectron2 border rule (clamp into [0, size-1],
    zero weight outside (-1, size))."""
    s = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr
    pos = (starts[:, None, None]
           + (jnp.arange(n_bins, dtype=jnp.float32)[None, :, None]
              + s[None, None, :]) * bin_sizes[:, None, None])   # (N, nb, sr)
    valid = (pos > -1.0) & (pos < size)
    p = jnp.clip(pos, 0.0, size - 1)
    p0 = jnp.floor(p)
    frac = p - p0
    i0 = p0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, size - 1)
    w0 = jnp.where(valid, 1.0 - frac, 0.0)[..., None]
    w1 = jnp.where(valid, frac, 0.0)[..., None]
    iota = jnp.arange(size, dtype=jnp.int32)
    m = (w0 * (iota == i0[..., None]) + w1 * (iota == i1[..., None]))
    return m.mean(axis=2)                                       # (N, nb, size)


@functools.partial(jax.jit, static_argnames=("pooled", "sampling_ratio",
                                             "aligned", "out_dtype"))
def roi_align_matmul(feat: Array, rois: Array, spatial_scale: float,
                     pooled: Tuple[int, int] = (7, 7),
                     sampling_ratio: int = 2, aligned: bool = False,
                     out_dtype=None) -> Array:
    """RoIAlign as two batched interpolation matmuls (MXU path).

    Numerically equivalent to :func:`roi_align` (same samples, same border
    rule; only the f32 accumulation order differs): bilinear interpolation is
    separable, so pooling is ``Ky @ feat @ Kxᵀ`` with per-roi (ph, H) and
    (pw, W) weight matrices. The reference's RoiAlign.cu gathers 4 corners
    per sample; on TPU that gather is ~50× slower than these contractions
    (the whole feature map is a few MB while the gather stream is GBs)."""
    ph, pw = pooled
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - off
    y1 = rois[:, 1] * spatial_scale - off
    x2 = rois[:, 2] * spatial_scale - off
    y2 = rois[:, 3] * spatial_scale - off
    rw = jnp.maximum(x2 - x1, 1.0 if not aligned else 1e-6)
    rh = jnp.maximum(y2 - y1, 1.0 if not aligned else 1e-6)
    h, w, c = feat.shape
    ky = _interp_matrix(y1, rh / ph, ph, sampling_ratio, h)     # (N, ph, H)
    kx = _interp_matrix(x1, rw / pw, pw, sampling_ratio, w)     # (N, pw, W)
    dt = out_dtype or feat.dtype
    # rows first (shared feat), then per-roi column contraction; keep the
    # (N, ph, W, C) intermediate in feat dtype to halve HBM traffic
    t = jnp.einsum("nph,hwc->npwc", ky, feat.astype(jnp.float32),
                   preferred_element_type=jnp.float32).astype(dt)
    return jnp.einsum("npwc,nqw->npqc", t.astype(jnp.float32), kx,
                      preferred_element_type=jnp.float32).astype(dt)
