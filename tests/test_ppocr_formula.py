"""PP-FormulaNet: while_loop decode vs an eager reference loop that mirrors
the TRT decoder-step graph (concat-grown KV states, model.cpp:2594-2651 +
ppocrv5_formula.cpp:645-766), tokenizer byte-BPE semantics, preprocess."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models import ppocr_formula as M
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.pipelines.formula import (FormulaTokenizer, preprocess)


def _eager_decode(params, memory, max_len):
    """Reference semantics: per step, self-K/V CONCATENATED to the grown
    state (state_6..37), cross-K/V recomputed from memory every step."""
    mem = P.linear(memory, params["mem_proj"])
    hist_k = [jnp.zeros((M.DEC_HEADS, 0, M.DEC_HD)) for _ in params["layers"]]
    hist_v = [jnp.zeros((M.DEC_HEADS, 0, M.DEC_HD)) for _ in params["layers"]]
    token = M.BOS_ID
    ids = []
    for t in range(max_len):
        h = params["embed"][token][None, None] * np.sqrt(512.0)
        h = h + params["pos_embed"][t + 2][None, None]
        h = P.layer_norm(h, params["emb_ln"], eps=1e-5)
        for li, lp in enumerate(params["layers"]):
            s = P.layer_norm(h, lp["self_ln"], eps=1e-5)
            q = M._heads(P.linear(s, lp["self_q"]))
            k_new = M._heads(P.linear(s, lp["self_k"]))
            v_new = M._heads(P.linear(s, lp["self_v"]))
            hist_k[li] = jnp.concatenate([hist_k[li], k_new], axis=1)
            hist_v[li] = jnp.concatenate([hist_v[li], v_new], axis=1)
            ctx = M._attend(q, hist_k[li], hist_v[li])
            h = h + P.linear(ctx, lp["self_proj"])
            c = P.layer_norm(h, lp["cross_ln"], eps=1e-5)
            cq = M._heads(P.linear(c, lp["cross_q"]))
            ck = M._heads(P.linear(mem, lp["cross_k"]))
            cv = M._heads(P.linear(mem, lp["cross_v"]))
            h = h + P.linear(M._attend(cq, ck, cv), lp["cross_proj"])
            f = P.layer_norm(h, lp["ffn_ln"], eps=1e-5)
            f = P.linear(f, lp["ffn0"])
            h = h + P.linear(nn.gelu_erf(f), lp["ffn1"])
        h = P.layer_norm(h, params["final_ln"], eps=1e-5)
        logits = P.linear(h, params["logits"])[0, 0]
        token = int(jnp.argmax(logits))
        ids.append(token)
        if token == M.EOS_ID:
            break
    return ids


def test_while_loop_decode_matches_eager(rng):
    cfg = dataclasses.replace(M.FormulaCfg(), max_len=5)
    params = jax.tree.map(jnp.asarray,
                          M.build_decoder_params(RandomWeightMap(), cfg))
    memory = jnp.asarray(rng.normal(0, 0.3, (1, 9, 1024)).astype(np.float32))
    ids, length = jax.jit(
        lambda p, m: M.decode(p, m, cfg))(params, memory)
    exp = _eager_decode(params, memory, cfg.max_len)
    n = int(length)
    assert n == len(exp)
    assert np.asarray(ids)[:n].tolist() == exp


def test_decode_stops_at_eos(rng):
    """Logit head rigged to always argmax EOS → one step."""
    cfg = dataclasses.replace(M.FormulaCfg(), max_len=8)
    wm = RandomWeightMap()
    params = M.build_decoder_params(wm, cfg)
    # final LN rigged to output all-ones (g=0, b=1); bias-free logit head
    # with only the EOS column non-zero then always argmaxes EOS.
    params["final_ln"]["b"] = np.full(512, 1.0, np.float32)
    params["final_ln"]["g"] = np.zeros(512, np.float32)
    w = np.zeros((512, M.VOCAB), np.float32)
    w[:, M.EOS_ID] = 1.0
    params["logits"]["w"] = w
    params = jax.tree.map(jnp.asarray, params)
    memory = jnp.asarray(rng.normal(0, 0.3, (1, 4, 1024)).astype(np.float32))
    ids, length = M.decode(params, memory, cfg)
    assert int(length) == 1
    assert int(np.asarray(ids)[0]) == M.EOS_ID


def test_tokenizer_byte_bpe_decode():
    # GPT-2 byte coding: space ↔ "Ġ" (U+0120)
    vocab = {"E": 5, "Ġ=": 6, "Ġm": 7, "c": 8, "^": 9, "{": 10, "2": 11,
             "}": 12}
    tok = FormulaTokenizer(vocab=vocab)
    ids = [5, 6, 7, 8, 9, 10, 11, 12, M.EOS_ID, 99]
    assert tok.decode(ids) == "E=mc^{2}"


def test_tokenizer_postprocess_keeps_letter_spaces():
    assert FormulaTokenizer._postprocess("a b") == "a b"
    assert FormulaTokenizer._postprocess("a + b") == "a+b"
    assert FormulaTokenizer._postprocess(r"\text  {x y}") == r"\text{x y}"


def test_preprocess_shapes_and_crop():
    img = np.full((100, 200, 3), 255, np.uint8)
    img[30:60, 50:120] = 0  # dark content box
    x = preprocess(img, 64, 64)
    assert x.shape == (1, 64, 64, 1)
    # dark content maps to (0/255 - mean)/std, white padding differs
    assert x.min() < -4.0 and np.isfinite(x).all()


def test_formula_full_graph_smoke(rng):
    model = get_model("pp_formulanet_plus_l")
    cfg = dataclasses.replace(model.default_cfg(), input_h=224, input_w=224,
                              max_len=3)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 224, 224, 1)).astype(np.float32)
    ids, length = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    assert ids.shape == (3,)
    assert 1 <= int(length) <= 3
