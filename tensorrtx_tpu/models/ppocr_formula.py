"""PP-FormulaNet plus-L: formula image → LaTeX token ids.

Reference: ppocrv5/src/model.cpp:2670-2775 (encoder), :2535-2651 + 2777-2883
(decoder step with the 38-state contract), ppocrv5/ppocrv5_formula.cpp:645-766
(host-driven decode loop: re-bind 38 states per step, stop on EOS id 2 or
2560 steps).

TPU-native redesign: the host loop becomes ONE `lax.while_loop` running
fully on device — fixed-size KV caches written with dynamic_update_slice
replace the reference's growing state_6..37 tensors, and the cross-attention
K/V (reference recomputes them from memory EVERY step, model.cpp:2626-2631)
are hoisted out of the loop and computed once. The carry mirrors the
reference's recurrent states: (cond, counter[state_2], last_token[state_3],
generated[state_5], position[state_38], kv caches[state_6..37]).

Encoder = the SLANeXt ViT at 48x48 (window 14, padded 56) + a deeper conv
neck down to (1, 144, 1024) memory.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.models import _slanext_vit as V
from tensorrtx_tpu.ops import nn

VOCAB = 50000
DIM = 512
DEC_HEADS = 16
DEC_HD = 32
MEM_TOKENS = 144
BOS_ID = 0
EOS_ID = 2
MAX_LEN = 2560


@dataclasses.dataclass
class FormulaCfg:
    input_h: int = 768
    input_w: int = 768
    max_len: int = MAX_LEN


# ---- encoder ----------------------------------------------------------------

def build_encoder_params(wm, cfg: FormulaCfg):
    size = cfg.input_h // 16
    return {"patch": P.pconv(wm, "conv2d_0", 768, 3, 16),
            "pos": wm.tensor(P.by_prefix(wm, "create_parameter_0.w_0"),
                             (1, size, size, 768)),
            "blocks": V.build_vit_params(wm, size),
            "neck0": P.pconv(wm, "conv2d_1", 256, 768, 1, bias=False),
            "n0_ln": V.ln2d(wm, "create_parameter_25.w_0",
                            "create_parameter_26.w_0", 256),
            "neck1": P.pconv(wm, "conv2d_2", 256, 256, 3, bias=False),
            "n1_ln": V.ln2d(wm, "create_parameter_27.w_0",
                            "create_parameter_28.w_0", 256),
            "neck2": P.pconv(wm, "conv2d_3", 512, 256, 3, bias=False),
            "neck3": P.pconv(wm, "conv2d_4", 1024, 512, 3, bias=False),
            "mem_proj": P.plinear(wm, "linear_48", 1024, 1024)}


def encoder_apply(params, x, cfg: FormulaCfg):
    """x: (1, H, W, 1) normalized gray → formula_memory (1, tokens, 1024)."""
    size = cfg.input_h // 16
    y = jnp.concatenate([x, x, x], axis=-1)  # gray → rgb (model.cpp:2691)
    y = P.conv(y, params["patch"], stride=16)
    y = y + params["pos"].astype(y.dtype)
    y = V.apply_vit(params["blocks"], y, size)
    y = P.conv(y, params["neck0"])
    y = V.apply_ln2d(y, params["n0_ln"])
    y = P.conv(y, params["neck1"], padding=1)
    y = V.apply_ln2d(y, params["n1_ln"])
    y = P.conv(y, params["neck2"], stride=2, padding=1)
    y = P.conv(y, params["neck3"], stride=2, padding=1)  # (1, s/4, s/4, 1024)
    b, h, w, c = y.shape
    seq = y.reshape(b, h * w, c)
    return P.linear(seq, params["mem_proj"])


# ---- decoder ----------------------------------------------------------------

def build_decoder_params(wm, cfg: FormulaCfg):
    p = {"mem_proj": P.plinear(wm, "linear_380", 1024, DIM),
         "embed": wm.tensor("embedding_3.w_0", (VOCAB, DIM)),
         "pos_embed": wm.tensor(
             "m_bart_learned_positional_embedding_3.w_0",
             (MAX_LEN + 2, DIM)),
         "emb_ln": {"g": wm.vec("create_parameter_43.w_0", DIM),
                    "b": wm.vec("create_parameter_44.w_0", DIM)},
         "layers": []}
    for i in range(8):
        lb = 300 + i * 10
        nb = 103 + i * 3
        p["layers"].append({
            "self_ln": P.pln(wm, f"layer_norm_{nb}", DIM),
            "self_k": P.plinear(wm, f"linear_{lb}", DIM, DIM),
            "self_v": P.plinear(wm, f"linear_{lb + 1}", DIM, DIM),
            "self_q": P.plinear(wm, f"linear_{lb + 2}", DIM, DIM),
            "self_proj": P.plinear(wm, f"linear_{lb + 3}", DIM, DIM),
            "cross_ln": P.pln(wm, f"layer_norm_{nb + 1}", DIM),
            "cross_k": P.plinear(wm, f"linear_{lb + 4}", DIM, DIM),
            "cross_v": P.plinear(wm, f"linear_{lb + 5}", DIM, DIM),
            "cross_q": P.plinear(wm, f"linear_{lb + 6}", DIM, DIM),
            "cross_proj": P.plinear(wm, f"linear_{lb + 7}", DIM, DIM),
            "ffn_ln": P.pln(wm, f"layer_norm_{nb + 2}", DIM),
            "ffn0": P.plinear(wm, f"linear_{lb + 8}", DIM, 4 * DIM),
            "ffn1": P.plinear(wm, f"linear_{lb + 9}", 4 * DIM, DIM),
        })
    p["final_ln"] = P.pln(wm, "layer_norm_127", DIM)
    p["logits"] = P.plinear(wm, "linear_299", DIM, VOCAB, bias=False)
    return p


def _heads(x):
    """(1, T, 512) → (16, T, 32) (addFormulaProjectHeads)."""
    t = x.shape[1]
    return x.reshape(t, DEC_HEADS, DEC_HD).transpose(1, 0, 2)


def _attend(q, k, v, mask=None):
    """q: (16, 1, 32); k/v: (16, T, 32) → (1, 1, 512)."""
    s = (q / np.sqrt(DEC_HD)) @ k.transpose(0, 2, 1)  # (16, 1, T)
    if mask is not None:
        s = jnp.where(mask[None, None, :], s, jnp.finfo(s.dtype).min)
    a = jax.nn.softmax(s, axis=-1)
    ctx = a @ v  # (16, 1, 32)
    return ctx.transpose(1, 0, 2).reshape(1, 1, DIM)


def decode(params, memory, cfg: FormulaCfg):
    """memory: (1, tokens, 1024) → (ids (max_len,), length).

    One on-device while_loop; ids[t] is the token emitted at step t
    (reference state_5 minus the leading BOS). length counts emitted tokens
    including the final EOS if produced.
    """
    dtype = memory.dtype
    max_len = cfg.max_len
    mem = P.linear(memory, params["mem_proj"])  # (1, T, 512)

    # cross K/V are step-invariant: hoist out of the loop (the reference
    # recomputes them per step — model.cpp:2626-2631)
    cross_k = [_heads(P.linear(mem, lp["cross_k"])) for lp in params["layers"]]
    cross_v = [_heads(P.linear(mem, lp["cross_v"])) for lp in params["layers"]]

    embed = params["embed"].astype(dtype)
    pos_embed = params["pos_embed"].astype(dtype)
    n_layers = len(params["layers"])

    def body(carry):
        _, t, token, ids, done, k_cache, v_cache = carry
        h = embed[token][None, None] * np.sqrt(float(DIM))  # (1, 1, 512)
        h = h + pos_embed[t + 2][None, None]  # state_38 starts at 1, +1
        h = P.layer_norm(h, params["emb_ln"], eps=1e-5)

        valid = jnp.arange(max_len) <= t
        new_k, new_v = [], []
        for li, lp in enumerate(params["layers"]):
            s = P.layer_norm(h, lp["self_ln"], eps=1e-5)
            q = _heads(P.linear(s, lp["self_q"]))
            k_new = _heads(P.linear(s, lp["self_k"]))  # (16, 1, 32)
            v_new = _heads(P.linear(s, lp["self_v"]))
            kc = jax.lax.dynamic_update_slice(k_cache[li], k_new, (0, t, 0))
            vc = jax.lax.dynamic_update_slice(v_cache[li], v_new, (0, t, 0))
            new_k.append(kc)
            new_v.append(vc)
            ctx = _attend(q, kc, vc, mask=valid)
            h = h + P.linear(ctx, lp["self_proj"])

            c = P.layer_norm(h, lp["cross_ln"], eps=1e-5)
            cq = _heads(P.linear(c, lp["cross_q"]))
            ctx = _attend(cq, cross_k[li], cross_v[li])
            h = h + P.linear(ctx, lp["cross_proj"])

            f = P.layer_norm(h, lp["ffn_ln"], eps=1e-5)
            f = P.linear(f, lp["ffn0"])
            f = nn.gelu_erf(f)
            h = h + P.linear(f, lp["ffn1"])

        h = P.layer_norm(h, params["final_ln"], eps=1e-5)
        logits = P.linear(h, params["logits"])[0, 0]  # (VOCAB,)
        next_token = jnp.argmax(logits).astype(jnp.int32)
        ids = jax.lax.dynamic_update_slice(ids, next_token[None], (t,))
        done = done | (next_token == EOS_ID)
        t = t + 1
        cond = (t < max_len) & ~done
        return (cond, t, next_token, ids, done,
                tuple(new_k), tuple(new_v))

    k0 = tuple(jnp.zeros((DEC_HEADS, max_len, DEC_HD), dtype)
               for _ in range(n_layers))
    init = (jnp.array(True), jnp.array(0, jnp.int32),
            jnp.array(BOS_ID, jnp.int32),
            jnp.zeros((max_len,), jnp.int32), jnp.array(False), k0, k0)
    out = jax.lax.while_loop(lambda c: c[0], body, init)
    _, t, _, ids, _, _, _ = out
    return ids, t


def build_params(wm, cfg: FormulaCfg):
    return {"encoder": build_encoder_params(wm, cfg),
            "decoder": build_decoder_params(wm, cfg)}


def apply(params, x, cfg: FormulaCfg):
    """x: (1, H, W, 1) normalized gray → (ids, length)."""
    memory = encoder_apply(params["encoder"], x, cfg)
    return decode(params["decoder"], memory, cfg)


def postprocess(outputs, cfg: FormulaCfg, tokenizer=None):
    ids, length = outputs
    ids = np.asarray(ids)[: int(length)].tolist()
    if tokenizer is None:
        return {"ids": ids}
    return {"ids": ids, "latex": tokenizer.decode(ids)}


register(ModelDef(
    name="pp_formulanet_plus_l",
    build_params=build_params,
    apply=apply,
    default_cfg=FormulaCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 1),
    postprocess=postprocess,
    doc="PP-FormulaNet plus-L (reference: ppocrv5/src/model.cpp:2670-2883)",
))
