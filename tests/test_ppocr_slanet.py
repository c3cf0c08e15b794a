"""SLANet+ decoder: GRUCell torch parity, while_loop decode semantics,
full-graph smoke."""

import dataclasses

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models import _slanet_decoder as D


def test_gru_cell_matches_torch(rng):
    dim, cin = 16, 12
    p = {"w_ih": rng.normal(0, 0.2, (3 * dim, cin)).astype(np.float32),
         "b_ih": rng.normal(0, 0.1, 3 * dim).astype(np.float32),
         "w_hh": rng.normal(0, 0.2, (3 * dim, dim)).astype(np.float32),
         "b_hh": rng.normal(0, 0.1, 3 * dim).astype(np.float32)}
    x = rng.normal(0, 1, (1, cin)).astype(np.float32)
    h = rng.normal(0, 1, (1, dim)).astype(np.float32)
    got = np.asarray(D.gru_cell(jax.tree.map(jnp.asarray, p),
                                jnp.asarray(x), jnp.asarray(h)))

    cell = torch.nn.GRUCell(cin, dim)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(p["w_ih"]))
        cell.bias_ih.copy_(torch.from_numpy(p["b_ih"]))
        cell.weight_hh.copy_(torch.from_numpy(p["w_hh"]))
        cell.bias_hh.copy_(torch.from_numpy(p["b_hh"]))
        exp = cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()
    np.testing.assert_allclose(got, exp, atol=1e-5)


def _decoder_params(rng, feat_c, dim):
    raw = {}
    raw["linear_0.w_0"] = rng.normal(0, 0.1, (feat_c, dim)).astype(
        np.float32).ravel()
    raw["linear_1.w_0"] = rng.normal(0, 0.1, (dim, dim)).astype(
        np.float32).ravel()
    raw["linear_1.b_0"] = rng.normal(0, 0.1, dim).astype(np.float32)
    raw["linear_2.w_0"] = rng.normal(0, 0.1, (dim, 1)).astype(
        np.float32).ravel()
    raw["gru_cell_0.w_0"] = rng.normal(0, 0.1, (3 * dim, feat_c + 50)).astype(
        np.float32).ravel()
    raw["gru_cell_0.b_0"] = rng.normal(0, 0.1, 3 * dim).astype(np.float32)
    raw["gru_cell_0.w_1"] = rng.normal(0, 0.1, (3 * dim, dim)).astype(
        np.float32).ravel()
    raw["gru_cell_0.b_1"] = rng.normal(0, 0.1, 3 * dim).astype(np.float32)
    for i, (ci, co) in enumerate([(dim, dim), (dim, 50), (dim, dim),
                                  (dim, 8)]):
        raw[f"linear_{3+i}.w_0"] = rng.normal(0, 0.1, (ci, co)).astype(
            np.float32).ravel()
        raw[f"linear_{3+i}.b_0"] = rng.normal(0, 0.1, co).astype(np.float32)
    return raw


def test_decode_matches_python_loop(rng):
    """while_loop decode == an eager per-step python loop re-deriving
    model.cpp:2104-2210 semantics (attention → GRU → heads → argmax)."""
    feat_c, dim, steps = 24, 16, 7
    raw = _decoder_params(rng, feat_c, dim)
    p = jax.tree.map(
        jnp.asarray,
        D.build_decoder_params(WeightMap(raw), feat_c, dim, "linear_0",
                               "linear_1", "linear_2", "linear_3", "linear_4",
                               "linear_5", "linear_6"))
    seq = jnp.asarray(rng.normal(0, 1, (1, 9, feat_c)).astype(np.float32))
    loc_buf, char_buf, length = jax.jit(
        lambda p, s: D.decode(p, s, dim, max_steps=steps))(p, seq)

    # eager reference loop
    attn_feat = seq @ p["attn_proj"]["w"]
    hidden = jnp.zeros((1, dim))
    prev = jnp.zeros((1,), jnp.int32)
    locs, chars = [], []
    n = 0
    for _ in range(steps):
        one_hot = jax.nn.one_hot(prev, 50)
        e = jnp.tanh(attn_feat + (hidden @ p["hidden_proj"]["w"]
                                  + p["hidden_proj"]["b"])[:, None])
        a = jax.nn.softmax(e @ p["attn_score"]["w"], axis=1)
        ctx = jnp.sum(a * seq, axis=1)
        hidden = D.gru_cell(p, jnp.concatenate([ctx, one_hot], -1), hidden)
        ch = (hidden @ p["char0"]["w"] + p["char0"]["b"])
        ch = ch @ p["char1"]["w"] + p["char1"]["b"]
        lc = jax.nn.sigmoid((hidden @ p["loc0"]["w"] + p["loc0"]["b"])
                            @ p["loc1"]["w"] + p["loc1"]["b"])
        locs.append(np.asarray(lc))
        chars.append(np.asarray(ch))
        prev = jnp.argmax(ch, -1).astype(jnp.int32)
        n += 1
        if int(prev[0]) == D.EOS_ID:
            break
    got_loc = np.asarray(loc_buf)[0, :n]
    np.testing.assert_allclose(got_loc, np.concatenate(locs, 0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(char_buf)[0, :n],
                               np.concatenate(chars, 0), atol=1e-4)
    assert int(length) == min(n + 1, steps)


def test_decode_stops_at_eos(rng):
    """Weights rigged so the char head always emits EOS → 1 step, len 2."""
    feat_c, dim = 8, 8
    raw = _decoder_params(rng, feat_c, dim)
    raw["linear_4.w_0"] = np.zeros((dim, 50), np.float32).ravel()
    b = np.zeros(50, np.float32)
    b[D.EOS_ID] = 10.0
    raw["linear_4.b_0"] = b
    p = jax.tree.map(
        jnp.asarray,
        D.build_decoder_params(WeightMap(raw), feat_c, dim, "linear_0",
                               "linear_1", "linear_2", "linear_3", "linear_4",
                               "linear_5", "linear_6"))
    seq = jnp.asarray(rng.normal(0, 1, (1, 4, feat_c)).astype(np.float32))
    loc_buf, char_buf, length = D.decode(p, seq, dim, max_steps=20)
    assert int(length) == 2
    # only row 0 written
    assert np.abs(np.asarray(char_buf)[0, 1:]).max() == 0.0


def test_slanet_full_graph(rng):
    model = get_model("slanet_plus")
    cfg = dataclasses.replace(model.default_cfg(), input_h=160, input_w=160,
                              max_steps=6)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 160, 160, 3)).astype(np.float32)
    loc, chars, length = jax.jit(
        lambda p, v: model.apply(p, v, cfg))(params, x)
    assert loc.shape == (1, 6, 8) and chars.shape == (1, 6, 50)
    assert 1 <= int(length) <= 6
    out = model.postprocess((loc, chars, length), cfg)
    assert out["probs"].shape[1] == int(length)
