"""Multi-scale deformable attention (RT-DETR document models).

TPU equivalent of the reference CUDA plugin
ppocrv5/plugin/ppocrv5_rtdetr_layer.cu:24-104:

  for level in {P3, P4, P5}, point in 0..3:
    sx = cx + ox·bw·0.5/4 ; sy = cy + oy·bh·0.5/4        (normalized)
    px = sx·W_l - 0.5 ; py = sy·H_l - 0.5                 (pixel, per level)
    out += weight · bilinear(value_level, px, py)          (OOB corners = 0)

TPU-first: per-head gathers are vmapped and each level's sampling is one
flat 4-corner take — no scalar loops, fixed shapes (L levels × 4 points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_POINTS = 4


def _sample_level(value_hw, px, py, h, w):
    """value_hw: (H*W, C); px/py: (Q, P) pixel coords. → (Q, P, C)."""
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx1 = px - x0
    wy1 = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take(value_hw, idx.reshape(-1), axis=0)
        vals = vals.reshape(*idx.shape, value_hw.shape[-1])
        return vals * (wgt * valid.astype(value_hw.dtype))[..., None]

    return (corner(x0i, y0i, (1 - wx1) * (1 - wy1))
            + corner(x0i + 1, y0i, wx1 * (1 - wy1))
            + corner(x0i, y0i + 1, (1 - wx1) * wy1)
            + corner(x0i + 1, y0i + 1, wx1 * wy1))


def ms_deform_attn(value, reference, offsets, weights, level_sizes):
    """value: (L_total, heads, hd); reference: (Q, 4) cxcywh normalized;
    offsets: (Q, heads, levels, 4, 2); weights: (Q, heads, levels, 4);
    level_sizes: static [(H, W), ...]. → (Q, heads*hd)."""
    q, heads, levels, pts, _ = offsets.shape
    cx, cy = reference[:, 0], reference[:, 1]
    bw, bh = reference[:, 2], reference[:, 3]
    # (Q, heads, levels, pts)
    sx = cx[:, None, None, None] + offsets[..., 0] * \
        (bw[:, None, None, None] * 0.5 / NUM_POINTS)
    sy = cy[:, None, None, None] + offsets[..., 1] * \
        (bh[:, None, None, None] * 0.5 / NUM_POINTS)

    out = jnp.zeros((q, heads, value.shape[-1]), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(level_sizes):
        vlvl = value[start:start + h * w]  # (H*W, heads, hd)
        start += h * w
        px = sx[:, :, lvl] * w - 0.5  # (Q, heads, pts)
        py = sy[:, :, lvl] * h - 0.5

        def per_head(v_h, px_h, py_h, w_h):
            s = _sample_level(v_h, px_h, py_h, h, w)  # (Q, pts, hd)
            return jnp.sum(s * w_h[..., None], axis=1)  # (Q, hd)

        out = out + jax.vmap(per_head, in_axes=(1, 1, 1, 1), out_axes=1)(
            vlvl, px, py, weights[:, :, lvl])
    return out.reshape(q, heads * value.shape[-1])
