"""SLANeXt/PP-FormulaNet ViT backbone: windowed attention + decomposed
relative position bias.

Reference: ppocrv5/src/model.cpp:730-1013 (addSLANeXtBlock,
addSLANeXtAttention, addSLANeXtRelativeAttention, window partition).

12 blocks, dim 768, 12 heads × 64; every 3rd block attends globally, the
rest over 14x14 zero-padded windows. The relative bias is the ViTDet-style
decomposed form: bias_h[q,k] = <q_unscaled, relH[qy, ky]>, added per-axis.
The (2s-1, 64) tables are expanded to dense (s, s, 64) lookup planes at
build time (model.cpp:730-753) so the hot path is pure einsum.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.ops import nn

DIM = 768
HEADS = 12
HEAD_DIM = 64


def _expand_rel(wm, name, size):
    """(2s-1, 64) table → dense (s, s, 64): rel[q, k] = t[q - k + s - 1]."""
    t = wm.tensor(P.by_prefix(wm, f"{name}.w_0"), (2 * size - 1, HEAD_DIM))
    q = np.arange(size)[:, None]
    k = np.arange(size)[None, :]
    return t[q - k + size - 1]  # (s, s, 64)


def build_block_params(wm, i, window_size, global_size, is_global):
    lb = i * 4
    nb = i * 2
    rel = i * 2 + 1
    size = global_size if is_global else window_size
    return {
        "ln0": P.pln(wm, f"layer_norm_{nb}", DIM),
        "q": P.plinear_part(wm, f"linear_{lb}", DIM, DIM, 0),
        "k": P.plinear_part(wm, f"linear_{lb}", DIM, DIM, 1),
        "v": P.plinear_part(wm, f"linear_{lb}", DIM, DIM, 2),
        "proj": P.plinear(wm, f"linear_{lb + 1}", DIM, DIM),
        "rel_h": _expand_rel(wm, f"create_parameter_{rel}", size),
        "rel_w": _expand_rel(wm, f"create_parameter_{rel + 1}", size),
        "ln1": P.pln(wm, f"layer_norm_{nb + 1}", DIM),
        "mlp0": P.plinear(wm, f"linear_{lb + 2}", DIM, 4 * DIM),
        "mlp1": P.plinear(wm, f"linear_{lb + 3}", 4 * DIM, DIM),
    }


def _attention(bp, x, size):
    """x: (U, size, size, 768) → attended (U, size, size, 768)."""
    u = x.shape[0]
    t = size * size
    seq = x.reshape(u, t, DIM)
    q = P.linear(seq, bp["q"]).reshape(u, t, HEADS, HEAD_DIM)
    k = P.linear(seq, bp["k"]).reshape(u, t, HEADS, HEAD_DIM)
    v = P.linear(seq, bp["v"]).reshape(u, t, HEADS, HEAD_DIM)
    q = q.transpose(0, 2, 1, 3)  # (U, H, T, 64)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    qk = (q / np.sqrt(HEAD_DIM)) @ k.transpose(0, 1, 3, 2)  # (U, H, T, T)

    # decomposed relative bias uses the UNSCALED q (model.cpp:852-854)
    qs = q.reshape(u, HEADS, size, size, HEAD_DIM)
    rel_h = bp["rel_h"].astype(x.dtype)
    rel_w = bp["rel_w"].astype(x.dtype)
    h_bias = jnp.einsum("uhyxc,ykc->uhyxk", qs, rel_h)
    w_bias = jnp.einsum("uhyxc,xkc->uhyxk", qs, rel_w)
    bias = h_bias[..., :, None] + w_bias[..., None, :]  # (U,H,y,x,ky,kx)
    qk = qk + bias.reshape(u, HEADS, t, t)

    attn = jax.nn.softmax(qk, axis=-1)
    ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(u, t, DIM)
    out = P.linear(ctx, bp["proj"])
    return out.reshape(u, size, size, DIM)


def _window_partition(x, size, padded, window):
    """(1, s, s, 768) → (n², w, w, 768) with zero pad to `padded`."""
    n = padded // window
    x = jnp.pad(x, ((0, 0), (0, padded - size), (0, padded - size), (0, 0)))
    x = x.reshape(1, n, window, n, window, DIM)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n * n, window, window, DIM)


def _window_unpartition(x, size, padded, window):
    n = padded // window
    x = x.reshape(1, n, n, window, window, DIM)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(1, padded, padded, DIM)
    return x[:, :size, :size]


def apply_block(bp, x, size, window, padded, is_global):
    """x: (1, size, size, 768)."""
    h = P.layer_norm(x, bp["ln0"], eps=1e-6)
    if is_global:
        attn = _attention(bp, h, size)
    else:
        win = _window_partition(h, size, padded, window)
        win = _attention(bp, win, window)
        attn = _window_unpartition(win, size, padded, window)
    x = x + attn
    h = P.layer_norm(x, bp["ln1"], eps=1e-6)
    h = P.linear(h, bp["mlp0"])
    h = nn.gelu_erf(h)
    return x + P.linear(h, bp["mlp1"])


def build_vit_params(wm, size, window=14):
    blocks = []
    for i in range(12):
        blocks.append(build_block_params(wm, i, window, size, (i % 3) == 2))
    return blocks


def apply_vit(blocks, x, size, window=14, padded=None):
    if padded is None:
        padded = ((size + window - 1) // window) * window
    for i, bp in enumerate(blocks):
        x = apply_block(bp, x, size, window, padded, (i % 3) == 2)
    return x


def ln2d(wm, gamma_name, beta_name, ch):
    """addSLANeXtLayerNorm2d: LN over the channel axis, eps 1e-6."""
    return {"g": wm.vec(P.by_prefix(wm, gamma_name), ch),
            "b": wm.vec(P.by_prefix(wm, beta_name), ch)}


def apply_ln2d(x, p):
    return P.layer_norm(x, p, eps=1e-6)
