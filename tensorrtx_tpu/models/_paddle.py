"""Shared Paddle-export weight accessors + jnp micro-blocks for PP-OCRv5.

Paddle inference exports name tensors as:
  conv:   {name}.w_0 (OIHW) / .b_0
  BN:     {name}.w_0(gamma) .b_0(beta) .w_1(mean) .w_2(var), eps 1e-5
  linear: {name}.w_0 stored (in, out) / .b_0
(reference: ppocrv5/src/block.cpp:28-150, 904-954).

The reference's *ByPrefix helpers tolerate deduplicated names
("name" or "name_<suffix>"); *ByPrefixOrder resolves Paddle deepcopy
clones ("name_deepcopy_<n>") in order (block.cpp:74-86, 1046-1079).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


def by_prefix(wm, name):
    """getWeightsByPrefix (block.cpp:74-86): exact name, else 'name_*'."""
    if name in wm:
        return name
    prefix = name + "_"
    raw = getattr(wm, "raw", {})
    for key in raw:
        if key.startswith(prefix):
            return key
    return name  # RandomWeightMap fabricates on demand


def by_prefix_order(wm, prefix, order):
    """getWeightsByPrefixOrder (block.cpp:1061-1079): deepcopy_<n> ordering."""
    raw = getattr(wm, "raw", {})
    marker = prefix + "_deepcopy_"
    matched = []
    for key in raw:
        if key == prefix or key.startswith(prefix + "_"):
            n = 0
            if marker in key:
                tail = key[key.index(marker) + len(marker):]
                digits = ""
                for ch in tail:
                    if ch.isdigit():
                        digits += ch
                    else:
                        break
                n = int(digits) if digits else 0
            matched.append((n, key))
    fabricates = "__prefix_order_probe__" in wm  # RandomWeightMap: always True
    if not matched or (order >= len(matched) and fabricates):
        # RandomWeightMap: fabricate a deterministic per-order name
        return prefix if order == 0 else f"{prefix}_deepcopy_{order}"
    matched.sort()
    if order >= len(matched):
        raise KeyError(f"missing ordered weight prefix {prefix} order={order}")
    return matched[order][1]


def pconv(wm, name, co, ci, kh, kw=None, groups=1, bias=True):
    """Paddle conv {name}.w_0 OIHW → HWIO (+ optional .b_0)."""
    if kw is None:
        kw = kh
    w = wm.tensor(by_prefix(wm, f"{name}.w_0"), (co, ci // groups, kh, kw))
    b = wm.vec(by_prefix(wm, f"{name}.b_0"), co) if bias else None
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": b}


def pbn(wm, name, ch, eps=BN_EPS):
    """Paddle BN folded to channel scale/shift (block.cpp:88-118)."""
    g = wm.vec(by_prefix(wm, f"{name}.w_0"), ch)
    b = wm.vec(by_prefix(wm, f"{name}.b_0"), ch)
    m = wm.vec(by_prefix(wm, f"{name}.w_1"), ch)
    v = wm.vec(by_prefix(wm, f"{name}.w_2"), ch)
    s = g / np.sqrt(v + eps)
    return s, b - m * s


def pconv_bn(wm, conv_name, bn_name, co, ci, kh, kw=None, groups=1,
             bias=False, eps=BN_EPS):
    """convBn with the BN folded into the conv weight/bias."""
    p = pconv(wm, conv_name, co, ci, kh, kw, groups=groups, bias=bias)
    s, sh = pbn(wm, bn_name, co, eps)
    w = p["w"] * s[None, None, None, :]
    b = sh if p["b"] is None else p["b"] * s + sh
    return {"w": w, "b": b}


def plinear(wm, name, ci, co, bias=True):
    """Paddle linear: w_0 stored (in, out) — already matmul-ready."""
    w = wm.tensor(by_prefix(wm, f"{name}.w_0"), (ci, co))
    b = wm.vec(by_prefix(wm, f"{name}.b_0"), co) if bias else None
    return {"w": w, "b": b}


def plinear_part(wm, name, ci, co, part, n_parts=3):
    """sliceLinearKernel/Bias (block.cpp:956-981): fused qkv column slice."""
    w = wm.tensor(by_prefix(wm, f"{name}.w_0"), (ci, co * n_parts))
    b = wm.vec(by_prefix(wm, f"{name}.b_0"), co * n_parts)
    return {"w": w[:, part * co:(part + 1) * co].copy(),
            "b": b[part * co:(part + 1) * co].copy()}


def plinear_ord(wm, name, order, ci, co, bias=True):
    """addLinearByPrefixOrder: Paddle deepcopy-cloned linear, nth clone."""
    w = wm.tensor(by_prefix_order(wm, f"{name}.w_0", order), (ci, co))
    b = wm.vec(by_prefix_order(wm, f"{name}.b_0", order), co) if bias else None
    return {"w": w, "b": b}


def plinear_part_ord(wm, name, order, ci, co, part, n_parts=3):
    """addLinearPartByPrefixOrder: fused-qkv column slice of the nth clone."""
    w = wm.tensor(by_prefix_order(wm, f"{name}.w_0", order), (ci, co * n_parts))
    b = wm.vec(by_prefix_order(wm, f"{name}.b_0", order), co * n_parts)
    return {"w": w[:, part * co:(part + 1) * co].copy(),
            "b": b[part * co:(part + 1) * co].copy()}


def pln_ord(wm, name, order, ch):
    return {"g": wm.vec(by_prefix_order(wm, f"{name}.w_0", order), ch),
            "b": wm.vec(by_prefix_order(wm, f"{name}.b_0", order), ch)}


def pln(wm, name, ch):
    return {"g": wm.vec(by_prefix(wm, f"{name}.w_0"), ch),
            "b": wm.vec(by_prefix(wm, f"{name}.b_0"), ch)}


# ---- jnp micro-blocks -------------------------------------------------------

def linear(x, p):
    y = x @ p["w"].astype(x.dtype)
    if p.get("b") is not None:
        y = y + p["b"].astype(x.dtype)
    return y


def conv(x, p, stride=1, padding=0, groups=1, dilation=1):
    return nn.conv2d(x, p["w"], p["b"], stride=stride, padding=padding,
                     groups=groups, dilation=dilation)


def se_layer(x, squeeze_p, excite_p, slope=1.0 / 6.0):
    """seLayer (block.cpp:391-431): GAP → fc/relu/fc → hard-sigmoid gate."""
    w = jnp.mean(x, axis=(1, 2), keepdims=True)
    w = jax.nn.relu(conv(w, squeeze_p))
    w = conv(w, excite_p)
    return x * jnp.clip(slope * w + 0.5, 0.0, 1.0)


def layer_norm(x, p, eps=1e-5):
    return nn.layer_norm(x, jnp.asarray(p["g"], x.dtype),
                         jnp.asarray(p["b"], x.dtype), eps=eps)
