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
    """x (H, W, C); ys/xs (Ho, Wo) float → (Ho, Wo, C).

    Reference semantics (dcn_v2_im2col_cuda.cu dmcn_im2col_bilinear):
    positions fully outside (beyond the (-1, h) band) are zero, and each of
    the four corners contributes only if it lies inside the map — so a
    sample in the (-1, 0) band gets a PARTIAL contribution from row/col 0,
    not a clamped full one."""
    h, w, _ = x.shape
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    ly = (ys - y0f)[..., None]
    lx = (xs - x0f)[..., None]
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)
    out = 0.0
    for dy, wy in ((0, 1 - ly), (1, ly)):
        for dx, wx in ((0, 1 - lx), (1, lx)):
            yy = y0 + dy
            xx = x0 + dx
            ok = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
            g = x[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            out = out + jnp.where(ok, g * (wy * wx), 0.0)
    return out


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
