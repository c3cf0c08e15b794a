"""LSTM via lax.scan — TPU replacement for TensorRT addRNNv2(kLSTM)
(crnn/crnn.cpp:166-207).

Weights use torch nn.LSTM layout: w_ih (4H, I), w_hh (4H, H), b_ih, b_hh with
gate order (input, forget, cell, output) — the exact order the reference maps
onto RNNGateType (crnn.cpp:168-205).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["lstm", "bilstm"]


def _cell_scan(x_seq, w_ih, w_hh, b, hidden):
    """x_seq: (T, B, I) → outputs (T, B, H). Gates computed as one fused
    matmul per step; the input projection for ALL steps is hoisted out of the
    scan so the MXU sees one big (T·B, I)×(I, 4H) matmul."""
    t, bsz, _ = x_seq.shape
    x_proj = jnp.einsum("tbi,ih->tbh", x_seq, w_ih.T,
                        preferred_element_type=jnp.float32).astype(x_seq.dtype)
    x_proj = x_proj + b.astype(x_seq.dtype)

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.dot(h, w_hh.T.astype(h.dtype))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((bsz, hidden), x_seq.dtype)
    (_, _), out = jax.lax.scan(step, (h0, h0), x_proj)
    return out


def lstm(x_seq: Array, p: dict, reverse: bool = False) -> Array:
    """p: {'w_ih','w_hh','b_ih','b_hh'}; x_seq (T, B, I) → (T, B, H)."""
    hidden = p["w_hh"].shape[1]
    b = p["b_ih"] + p["b_hh"]
    xs = x_seq[::-1] if reverse else x_seq
    out = _cell_scan(xs, p["w_ih"], p["w_hh"], b, hidden)
    return out[::-1] if reverse else out


def bilstm(x_seq: Array, fwd: dict, bwd: dict) -> Array:
    """(T, B, I) → (T, B, 2H), forward ++ backward concat (torch
    bidirectional=True layout)."""
    return jnp.concatenate([lstm(x_seq, fwd), lstm(x_seq, bwd, reverse=True)],
                           axis=-1)
