"""Modulated deformable convolution v2 (DCNv2).

Reference: centernet/dcnv2Plugin/dcn_v2_im2col_cuda.cu (+ dcnv2Plugin.cpp) —
the CUDA plugin does an im2col gather at offset sample positions then a GEMM.
TPU formulation is the same algebra without the explicit im2col buffer: K
static kernel taps, each a vectorized bilinear gather at (base + offset),
modulated by the mask, contracted against the weights on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["dcn_v2"]


def _gather_bilinear(x: Array, ys: Array, xs: Array) -> Array:
    """x (H, W, C); ys/xs (Ho, Wo) float → (Ho, Wo, C); zero outside."""
    h, w, _ = x.shape
    valid = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    y = jnp.clip(ys, 0.0, h - 1)
    xq = jnp.clip(xs, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(xq).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (xq - x0)[..., None]
    out = (x[y0, x0] * (1 - ly) * (1 - lx) + x[y0, x1] * (1 - ly) * lx
           + x[y1, x0] * ly * (1 - lx) + x[y1, x1] * ly * lx)
    return jnp.where(valid[..., None], out, 0.0)


@functools.partial(jax.jit, static_argnames=("stride", "padding", "dilation"))
def dcn_v2(x: Array, offset: Array, mask: Array, w: Array, b=None,
           stride: int = 1, padding: int = 1, dilation: int = 1) -> Array:
    """x (B,H,W,Cin); offset (B,Ho,Wo,2K) [Δy,Δx interleaved per tap,
    torch layout]; mask (B,Ho,Wo,K) (already sigmoided); w (kh,kw,Cin,Cout).

    Returns (B, Ho, Wo, Cout). K = kh*kw taps ordered row-major like the
    reference im2col.
    """
    kh, kw, cin, cout = w.shape
    K = kh * kw
    bsz, h, wdt, _ = x.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (wdt + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho, dtype=jnp.float32) * stride - padding
    base_x = jnp.arange(wo, dtype=jnp.float32) * stride - padding

    def per_image(xi, offi, maski):
        acc = jnp.zeros((ho, wo, cout), jnp.float32)
        for k in range(K):
            ky, kx = divmod(k, kw)
            dy = offi[..., 2 * k]
            dx = offi[..., 2 * k + 1]
            ys = base_y[:, None] + ky * dilation + dy
            xs = base_x[None, :] + kx * dilation + dx
            v = _gather_bilinear(xi, ys, xs) * maski[..., k:k + 1]
            acc = acc + jnp.einsum("hwc,cd->hwd", v.astype(jnp.float32),
                                   w[ky, kx].astype(jnp.float32))
        return acc

    out = jax.vmap(per_image)(x, offset, mask)
    if b is not None:
        out = out + b
    return out.astype(x.dtype)
