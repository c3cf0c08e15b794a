"""CRNN text recognition with CTC (reference: crnn/crnn.cpp — meijieru
crnn.pytorch: 7-conv VGG-ish cnn, two BidirectionalLSTM(256) + embedding
layers, 26-step sequence, 37-class CTC over "-0123456789a..z").

TRT's addRNNv2 LSTM becomes lax.scan (ops/rnn.py); the engine outputs
per-step (ids, probs) and the host does dedupe + dict lookup (ops/ctc.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.ctc import ctc_argmax, ctc_greedy_decode
from tensorrtx_tpu.ops.rnn import bilstm

ALPHABET = "-0123456789abcdefghijklmnopqrstuvwxyz"

# conv settings (crnn.cpp:34-36): kernel, stride, pad, out_ch, batchnorm
_CONVS = [(3, 1, 1, 64, False), (3, 1, 1, 128, False), (3, 1, 1, 256, True),
          (3, 1, 1, 256, False), (3, 1, 1, 512, True), (3, 1, 1, 512, False),
          (2, 1, 0, 512, True)]


@dataclasses.dataclass
class CrnnCfg:
    input_h: int = 32
    input_w: int = 100
    hidden: int = 256
    num_classes: int = 37
    raw_output: bool = False   # True → return (ids, probs) only


def _lstm_p(wm, name, in_f, hidden):
    def side(suffix):
        return {
            "w_ih": wm.tensor(f"{name}.weight_ih_l0{suffix}", (4 * hidden, in_f)),
            "w_hh": wm.tensor(f"{name}.weight_hh_l0{suffix}", (4 * hidden, hidden)),
            "b_ih": wm.vec(f"{name}.bias_ih_l0{suffix}", 4 * hidden),
            "b_hh": wm.vec(f"{name}.bias_hh_l0{suffix}", 4 * hidden),
        }
    return {"fwd": side(""), "bwd": side("_reverse")}


def build_params(wm, cfg: CrnnCfg):
    p = {"convs": [], "bns": {}}
    cin = 1
    for i, (k, s, pd, cout, bn) in enumerate(_CONVS):
        if bn:
            p["convs"].append(wm.conv_bn(f"cnn.conv{i}", f"cnn.batchnorm{i}",
                                         cout, cin, (k, k), eps=1e-5))
        else:
            p["convs"].append(wm.conv2d(f"cnn.conv{i}", cout, cin, (k, k)))
        cin = cout
    h = cfg.hidden
    p["rnn0"] = _lstm_p(wm, "rnn.0.rnn", 512, h)
    p["emb0"] = wm.linear("rnn.0.embedding", h, 2 * h)
    p["rnn1"] = _lstm_p(wm, "rnn.1.rnn", h, h)
    p["emb1"] = wm.linear("rnn.1.embedding", cfg.num_classes, 2 * h)
    return p


def apply(params, x, cfg: CrnnCfg):
    """x: (B, 32, W, 1) grayscale → per-step (ids, probs) + logits."""
    pools = {0: (2, 2, 0), 1: (2, 2, 0)}  # idx → (k, stride, pad) square
    y = x
    for i, (k, s, pd, cout, bn) in enumerate(_CONVS):
        cp = params["convs"][i]
        y = jax.nn.relu(nn.conv2d(y, cp["w"], cp["b"], stride=s, padding=pd))
        if i in (0, 1):
            y = nn.max_pool(y, 2, 2)
        elif i in (3, 5):
            # rectangular pool: 2x2 kernel, stride (2,1), pad (0,1)
            y = jax.lax.reduce_window(
                y, jnp.finfo(y.dtype).min, jax.lax.max,
                window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 1, 1),
                padding=[(0, 0), (0, 0), (1, 1), (0, 0)])
    # y: (B, 1, T, 512) → (T, B, 512)
    b = y.shape[0]
    seq = jnp.transpose(y[:, 0], (1, 0, 2))
    h = bilstm(seq, params["rnn0"]["fwd"], params["rnn0"]["bwd"])
    h = nn.linear(h, params["emb0"]["w"], params["emb0"]["b"])
    h = bilstm(h, params["rnn1"]["fwd"], params["rnn1"]["bwd"])
    logits = nn.linear(h, params["emb1"]["w"], params["emb1"]["b"])  # (T,B,C)
    ids, probs = ctc_argmax(logits)
    return {"logits": logits, "ids": ids, "probs": probs}


def decode_text(out, batch_idx: int = 0) -> str:
    import numpy as np

    ids = np.asarray(out["ids"])[:, batch_idx]
    probs = np.asarray(out["probs"])[:, batch_idx]
    text, _ = ctc_greedy_decode(ids, probs, ALPHABET)
    return text


register(ModelDef(
    name="crnn",
    build_params=build_params,
    apply=apply,
    default_cfg=CrnnCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 1),
    doc="CRNN text recognition + CTC (reference: crnn/)",
))
