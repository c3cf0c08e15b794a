"""SLANet/SLANeXt GRU attention decoder — on-device autoregressive loop.

Reference: the ILoop decoder in ppocrv5/src/model.cpp:2087-2236 (SLANet+)
and :2283-2431 (SLANeXt). Per step: additive attention over the encoder
sequence → context ⊕ one-hot(prev id) → GRUCell (r,z,n gates, Paddle/torch
layout) → char logits (50) + loc sigmoid (8); stop when EOS(id 49) was
emitted or 501 steps.

TPU-first: the host-driven TRT loop becomes one `lax.while_loop` with
fixed-size output buffers and `dynamic_update_slice` writes — zero
host↔device chatter during decode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tensorrtx_tpu.models import _paddle as P

MAX_STEPS = 501
NUM_CHARS = 50
LOC_DIM = 8
EOS_ID = 49


def build_decoder_params(wm, feat_c, dim, attn_proj, hidden_proj, attn_score,
                         char_fc0, char_fc1, loc_fc0, loc_fc1,
                         gru="gru_cell_0"):
    """Weight names differ per model (linear_0.. vs linear_48..)."""
    return {
        "attn_proj": P.plinear(wm, attn_proj, feat_c, dim, bias=False),
        "hidden_proj": P.plinear(wm, hidden_proj, dim, dim),
        "attn_score": P.plinear(wm, attn_score, dim, 1, bias=False),
        # Paddle GRUCell: w_0 (3*dim, feat_c+50) input kernel, w_1 (3*dim,
        # dim) hidden kernel, gates chunked [r|z|n] (model.cpp:2143-2174).
        "w_ih": wm.tensor(f"{gru}.w_0", (3 * dim, feat_c + NUM_CHARS)),
        "b_ih": wm.vec(f"{gru}.b_0", 3 * dim),
        "w_hh": wm.tensor(f"{gru}.w_1", (3 * dim, dim)),
        "b_hh": wm.vec(f"{gru}.b_1", 3 * dim),
        "char0": P.plinear(wm, char_fc0, dim, dim),
        "char1": P.plinear(wm, char_fc1, dim, NUM_CHARS),
        "loc0": P.plinear(wm, loc_fc0, dim, dim),
        "loc1": P.plinear(wm, loc_fc1, dim, LOC_DIM),
    }


def gru_cell(p, x, h):
    """torch/paddle GRUCell: h' = (1-z)·n + z·h with [r|z|n] gate chunks."""
    gi = x @ p["w_ih"].T.astype(x.dtype) + p["b_ih"].astype(x.dtype)
    gh = h @ p["w_hh"].T.astype(x.dtype) + p["b_hh"].astype(x.dtype)
    dim = h.shape[-1]
    ir, iz, inn = gi[..., :dim], gi[..., dim:2 * dim], gi[..., 2 * dim:]
    hr, hz, hn = gh[..., :dim], gh[..., dim:2 * dim], gh[..., 2 * dim:]
    r = jax.nn.sigmoid(ir + hr)
    z = jax.nn.sigmoid(iz + hz)
    n = jnp.tanh(inn + r * hn)
    return (h - n) * z + n


def decode(p, sequence, dim, max_steps: int = MAX_STEPS):
    """sequence: (1, T, feat_c) encoder features.

    Returns (loc (1, S, 8), char_logits (1, S, 50), length) with S=max_steps
    fixed; rows ≥ length are zero. length replicates the reference's
    outputLength = executed_steps + 1 (model.cpp:2217).
    """
    dtype = sequence.dtype
    attn_feat = P.linear(sequence, p["attn_proj"])  # (1, T, dim)

    def body(carry):
        _, counter, hidden, prev_id, loc_buf, char_buf, eos = carry
        one_hot = jax.nn.one_hot(prev_id, NUM_CHARS, dtype=dtype)  # (1, 50)
        e = jnp.tanh(attn_feat + P.linear(hidden, p["hidden_proj"])[:, None])
        score = P.linear(e, p["attn_score"])  # (1, T, 1)
        a = jax.nn.softmax(score, axis=1)
        context = jnp.sum(a * sequence, axis=1)  # (1, feat_c)
        x = jnp.concatenate([context, one_hot], axis=-1)
        hidden = gru_cell(p, x, hidden)
        char_logits = P.linear(P.linear(hidden, p["char0"]), p["char1"])
        loc = jax.nn.sigmoid(P.linear(P.linear(hidden, p["loc0"]),
                                      p["loc1"]))
        next_id = jnp.argmax(char_logits, axis=-1).astype(jnp.int32)  # (1,)
        loc_buf = jax.lax.dynamic_update_slice(loc_buf, loc[:, None],
                                               (0, counter, 0))
        char_buf = jax.lax.dynamic_update_slice(char_buf,
                                                char_logits[:, None],
                                                (0, counter, 0))
        eos = eos | jnp.any(next_id == EOS_ID)
        counter = counter + 1
        cond = (counter < max_steps) & ~eos
        return (cond, counter, hidden, next_id, loc_buf, char_buf, eos)

    init = (jnp.array(True), jnp.array(0, jnp.int32),
            jnp.zeros((1, dim), dtype), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, max_steps, LOC_DIM), dtype),
            jnp.zeros((1, max_steps, NUM_CHARS), dtype),
            jnp.array(False))
    out = jax.lax.while_loop(lambda c: c[0], body, init)
    _, counter, _, _, loc_buf, char_buf, _ = out
    length = jnp.minimum(counter + 1, max_steps)
    return loc_buf, char_buf, length


def postprocess(loc_buf, char_buf, length):
    """Host-side: slice to length, softmax chars (model.cpp:2219-2234)."""
    import numpy as np

    n = int(length)
    loc = np.asarray(loc_buf)[:, :n]
    logits = np.asarray(char_buf)[:, :n].astype(np.float64)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return loc, probs.astype(np.float32)
