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

__all__ = ["letterbox", "letterbox_batch", "letterbox_s2d",
           "letterbox_s2d_batch", "scale_boxes_back", "normalize"]


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


def _axis_weights(dst: int, src_static: int, src_dyn, scale):
    """Bilinear tent weights (dst, src_static) for the letterbox affine.

    w[d, s] = max(0, 1 - |src_pos(d) - s|), zeroed outside the dynamic
    valid range — so each row sums to the fraction of the sample taken from
    real pixels; the remainder is border mass.
    """
    d = jnp.arange(dst, dtype=jnp.float32)
    src = (d - dst * 0.5) / scale + src_dyn * 0.5 + 0.5
    s_idx = jnp.arange(src_static, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - s_idx[None, :]))
    w = jnp.where(s_idx[None, :] < src_dyn, w, 0.0)
    inb = (src > -1.0) & (src < src_dyn)
    return jnp.where(inb[:, None], w, 0.0)


def letterbox_mm(
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
    """Letterbox as two separable matmuls — MXU work instead of gathers.

    Identical semantics to `letterbox` (taps outside the image contribute
    border_value: out = W_y·img·W_xᵀ + (1 − rowsum_y·rowsum_x)·border).
    ~10× faster than the gather formulation at batch 32 on v5e.
    """
    H, W = img.shape[0], img.shape[1]
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    s = jnp.minimum(dst_h / src_h, dst_w / src_w)
    wy = _axis_weights(dst_h, H, src_h, s)           # (dst_h, H)
    wx = _axis_weights(dst_w, W, src_w, s)           # (dst_w, W)
    imgf = img.astype(jnp.float32)
    prec = jax.lax.Precision.HIGH  # bf16x3 passes: ~2^-21 error on pixels
    tmp = jnp.einsum("dh,hwc->dwc", wy, imgf, precision=prec)
    out = jnp.einsum("ew,dwc->dec", wx, tmp, precision=prec)
    border_mass = 1.0 - wy.sum(1)[:, None] * wx.sum(1)[None, :]
    out = out + border_mass[..., None] * border_value
    if bgr_to_rgb:
        out = out[..., ::-1]
    return out * scale + offset


def letterbox_s2d(
    img: Array,
    src_h,
    src_w,
    dst_h: int,
    dst_w: int,
    border_value: float = 128.0,
    bgr_to_rgb: bool = False,
    scale: float = 1.0 / 255.0,
    offset: float = 0.0,
    out_dtype=jnp.bfloat16,
    factor: int = 2,
) -> Array:
    """Letterbox emitted directly as an f×f space-to-depth parity tensor.

    Returns (dst_h/f, dst_w/f, f²·C) where channel block (a, b) holds
    letterbox output rows f·u+a, cols f·v+b — i.e. ``s2d(letterbox(img))``
    without ever materializing the full-res tensor or its transpose. The
    parity planes fall out of splitting the separable resize matrices by
    row phase (same total MXU FLOPs as `letterbox_mm`).

    Why: at batch 1 on TPU, a stride-2 small-channel first conv makes XLA
    emit pathological space-to-batch relayout copies (~300 µs of a 1 ms
    YOLO11n program). Feeding the net `conv2d_s2d` (factor 2) or the
    two-level `conv2d_s2d4` cascade (factor 4) instead keeps the whole
    stem as wide-K 2×2 stride-1 convs — numerically identical to
    conv(letterbox(img)) and ~1.7× faster end to end for YOLO11n.
    TPU-first replacement for preprocess.cu warpaffine + first layers.
    """
    H, W = img.shape[0], img.shape[1]
    f = factor
    assert dst_h % f == 0 and dst_w % f == 0
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    s = jnp.minimum(dst_h / src_h, dst_w / src_w)
    wy = _axis_weights(dst_h, H, src_h, s)
    wx = _axis_weights(dst_w, W, src_w, s)
    rs_y = wy.sum(1)
    rs_x = wx.sum(1)
    imgf = img.astype(out_dtype)
    if bgr_to_rgb:
        imgf = imgf[..., ::-1]
    prec = jax.lax.Precision.HIGH  # bf16x3: ~2^-21 pixel error
    k1 = scale * border_value + offset
    # all f² parity planes in two stacked einsums — the output's trailing
    # (a, b, c) axes reshape straight into the a-major/b/c channel order the
    # s2d convs expect, so no concatenate (a 16-way concat here was ~0.6 ms
    # of layout copies per batch-32 iter on v5e)
    uu, vv = dst_h // f, dst_w // f
    gy = (wy.reshape(uu, f, H).transpose(1, 0, 2) * scale).astype(out_dtype)
    gx = wx.reshape(vv, f, W).transpose(1, 0, 2).astype(out_dtype)
    # Dense separable contractions. A "banded" variant (16 output row-tiles,
    # each dynamic-slicing only the source band its tent weights touch) was
    # tried to cut the dst·src MACs ~10× — it measured WORSE on v5e: the
    # traced band offsets become gathers under vmap and the 32 small
    # einsums + concats cost ~150 µs/img of data formatting at batch 1
    # (vs ~60 µs for the two dense einsums, which XLA fuses cleanly).
    t1 = jnp.einsum("auh,hwc->auwc", gy, imgf, precision=prec)
    p = jnp.einsum("bvw,auwc->uvabc", gx, t1, precision=prec)
    # border mass: samples outside the (traced) valid region pull
    # border_value; offset applies to every pixel
    bm = 1.0 - (rs_y.reshape(uu, f).transpose(1, 0)[:, None, :, None]
                * rs_x.reshape(vv, f).transpose(1, 0)[None, :, None, :]
                ).transpose(2, 3, 0, 1)                     # (u, v, a, b)
    # fold the border/offset correction into ONE small pre-cast term so the
    # (u, v, a, b, c) tensor never round-trips through f32 (the f32 cast +
    # add was ~2 HBM passes, ~10 µs/img at b32; interior bm is ~1e-7 so the
    # bf16 add is 1-ulp noise on edge pixels only)
    corr = (bm * k1 + (1.0 - bm) * offset).astype(out_dtype)
    p = p + corr[..., None]
    return p.reshape(uu, vv, f * f * img.shape[-1])


def letterbox_s2d_batch(imgs: Array, src_hw: Array, dst_h: int, dst_w: int,
                        **kw) -> Array:
    """(B, H, W, C) uint8 + (B, 2) [h, w] → (B, dst_h/2, dst_w/2, 4C)."""
    return jax.vmap(lambda im, hw: letterbox_s2d(
        im, hw[0], hw[1], dst_h, dst_w, **kw))(imgs, src_hw)


def letterbox_batch(imgs: Array, src_hw: Array, dst_h: int, dst_w: int,
                    method: str = "matmul", **kw) -> Array:
    """(B, H, W, 3) uint8 + (B, 2) [h, w] → (B, dst_h, dst_w, 3) float32."""
    fn = letterbox_mm if method == "matmul" else letterbox
    return jax.vmap(lambda im, hw: fn(im, hw[0], hw[1], dst_h, dst_w, **kw))(
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
