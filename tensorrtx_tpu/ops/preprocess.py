"""Fused image preprocessing — TPU analog of the CUDA warp-affine kernel
(yolo11/src/preprocess.cu:7-117).

Reference semantics: letterbox affine (scale = min(dstH/srcH, dstW/srcW),
centered), bilinear sampling at src = d2s·dst + 0.5 with border value 128,
BGR→RGB, /255, HWC→CHW. On TPU the whole thing is a gather + elementwise
expression fused into the jitted program: the host hands over raw uint8
frames, nothing else.

Static shapes: the source image (or a padded bucket of it) has a static
shape; the actual height/width arrive as traced scalars so one compiled
program serves any image that fits the bucket.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["letterbox", "letterbox_batch", "scale_boxes_back", "normalize"]


def letterbox(
    img: Array,
    src_h,
    src_w,
    dst_h: int,
    dst_w: int,
    border_value: float = 128.0,
    bgr_to_rgb: bool = False,
    scale: float = 1.0 / 255.0,
    offset: float = 0.0,
) -> Array:
    """uint8 (H, W, 3) → float32 (dst_h, dst_w, 3), letterboxed + normalized.

    ``src_h``/``src_w`` may be traced scalars ≤ the static array dims (the
    image occupies the top-left corner of a padded bucket). Matches
    warpaffine_kernel's sampling: src = (dst - dst_c)/s + src_c + 0.5 with
    out-of-range → border_value, bilinear with border for partial taps.
    """
    H, W = img.shape[0], img.shape[1]
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    s = jnp.minimum(dst_h / src_h, dst_w / src_w)

    dx = jnp.arange(dst_w, dtype=jnp.float32)
    dy = jnp.arange(dst_h, dtype=jnp.float32)
    # inverse affine: src = (dst - dst/2)/s + src/2, then the kernel's +0.5
    src_x = (dx - dst_w * 0.5) / s + src_w * 0.5 + 0.5   # (dst_w,)
    src_y = (dy - dst_h * 0.5) / s + src_h * 0.5 + 0.5   # (dst_h,)

    oob_x = (src_x <= -1.0) | (src_x >= src_w)
    oob_y = (src_y <= -1.0) | (src_y >= src_h)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    lx = src_x - x0
    ly = src_y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    imgf = img.astype(jnp.float32)

    def tap_valid(xi, yi):
        vx = (xi >= 0) & (xi < src_w.astype(jnp.int32))
        vy = (yi >= 0) & (yi < src_h.astype(jnp.int32))
        return vx[None, :] & vy[:, None]

    def gather(xi, yi):
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        return imgf[yc][:, xc]  # (dst_h, dst_w, 3)

    v00 = gather(x0i, y0i)
    v01 = gather(x0i + 1, y0i)
    v10 = gather(x0i, y0i + 1)
    v11 = gather(x0i + 1, y0i + 1)
    bv = jnp.float32(border_value)
    m00 = tap_valid(x0i, y0i)[..., None]
    m01 = tap_valid(x0i + 1, y0i)[..., None]
    m10 = tap_valid(x0i, y0i + 1)[..., None]
    m11 = tap_valid(x0i + 1, y0i + 1)[..., None]
    v00 = jnp.where(m00, v00, bv)
    v01 = jnp.where(m01, v01, bv)
    v10 = jnp.where(m10, v10, bv)
    v11 = jnp.where(m11, v11, bv)

    wx = lx[None, :, None]
    wy = ly[:, None, None]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    oob = (oob_x[None, :] | oob_y[:, None])[..., None]
    out = jnp.where(oob, bv, out)
    if bgr_to_rgb:
        out = out[..., ::-1]
    return out * scale + offset


def letterbox_batch(imgs: Array, src_hw: Array, dst_h: int, dst_w: int,
                    **kw) -> Array:
    """(B, H, W, 3) uint8 + (B, 2) [h, w] → (B, dst_h, dst_w, 3) float32."""
    return jax.vmap(lambda im, hw: letterbox(im, hw[0], hw[1], dst_h, dst_w, **kw))(
        imgs, src_hw)


def scale_boxes_back(boxes: Array, src_h, src_w, dst_h: int, dst_w: int) -> Array:
    """Map xyxy boxes from letterboxed input space back to original image
    coords (inverse of the affine; reference get_rect, postprocess.cpp:4-40)."""
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    s = jnp.minimum(dst_h / src_h, dst_w / src_w)
    pad_x = (dst_w - s * src_w) * 0.5
    pad_y = (dst_h - s * src_h) * 0.5
    x1 = jnp.clip((boxes[..., 0] - pad_x) / s, 0, src_w)
    y1 = jnp.clip((boxes[..., 1] - pad_y) / s, 0, src_h)
    x2 = jnp.clip((boxes[..., 2] - pad_x) / s, 0, src_w)
    y2 = jnp.clip((boxes[..., 3] - pad_y) / s, 0, src_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def normalize(img: Array, mean, std, scale: float = 1.0 / 255.0) -> Array:
    """Generic (x*scale - mean)/std channelwise normalize (ppocr/imagenet)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) * scale - mean) / std
