"""SLANeXt ViT: window partition roundtrip, decomposed relative-bias parity
vs a direct numpy re-derivation, block smoke, full-graph smoke."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models import _slanext_vit as V


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, V.DIM)).astype(np.float32))
    win = V._window_partition(x, 32, 42, 14)
    assert win.shape == (9, 14, 14, V.DIM)
    back = V._window_unpartition(win, 32, 42, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_bias_matches_direct(rng):
    """Dense expanded rel planes == per-pair table lookup
    (model.cpp:730-753: rel[q,k] = table[q-k+size-1])."""
    size = 5
    table = rng.normal(0, 1, (2 * size - 1, V.HEAD_DIM)).astype(np.float32)
    raw = {"create_parameter_9.w_0": table.ravel()}
    got = V._expand_rel(WeightMap(raw), "create_parameter_9", size)
    for q in range(size):
        for k in range(size):
            np.testing.assert_array_equal(got[q, k], table[q - k + size - 1])


def test_attention_bias_semantics(rng):
    """h/w bias einsum == explicit loop over (head, qy, qx, ky, kx)."""
    size, heads, hd = 3, 2, 4
    q = rng.normal(0, 1, (1, heads, size, size, hd)).astype(np.float32)
    rel_h = rng.normal(0, 1, (size, size, hd)).astype(np.float32)
    rel_w = rng.normal(0, 1, (size, size, hd)).astype(np.float32)
    h_bias = np.einsum("uhyxc,ykc->uhyxk", q, rel_h)
    w_bias = np.einsum("uhyxc,xkc->uhyxk", q, rel_w)
    bias = h_bias[..., :, None] + w_bias[..., None, :]
    for h in range(heads):
        for qy in range(size):
            for qx in range(size):
                for ky in range(size):
                    for kx in range(size):
                        exp = (q[0, h, qy, qx] @ rel_h[qy, ky]
                               + q[0, h, qy, qx] @ rel_w[qx, kx])
                        np.testing.assert_allclose(
                            bias[0, h, qy, qx, ky, kx], exp, atol=1e-5)


def test_global_vs_window_block_shapes(rng):
    wm = RandomWeightMap()
    for i, is_global in ((0, False), (2, True)):
        bp = jax.tree.map(jnp.asarray,
                          V.build_block_params(wm, i, 14, 32, is_global))
        x = jnp.asarray(rng.normal(0, 0.5, (1, 32, 32, V.DIM))
                        .astype(np.float32))
        y = V.apply_block(bp, x, 32, 14, 42, is_global)
        assert y.shape == x.shape
        assert np.isfinite(np.asarray(y)).all()


def test_slanext_full_graph(rng):
    model = get_model("slanext_wired")
    cfg = dataclasses.replace(model.default_cfg(), input_h=224, input_w=224,
                              max_steps=4)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    loc, chars, length = jax.jit(
        lambda p, v: model.apply(p, v, cfg))(params, x)
    assert loc.shape == (1, 4, 8) and chars.shape == (1, 4, 50)
    assert np.isfinite(np.asarray(chars)).all()
