"""CTC greedy decode (reference: crnn/crnn.cpp strDecode + raw mode;
ppocrv5/src/postprocess.cpp:162 ctcDecode).

Device side produces per-step argmax ids + probs (fused into the engine);
dedupe + blank removal + dictionary lookup are trivially host-side.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ctc_argmax", "ctc_greedy_decode"]


def ctc_argmax(logits):
    """(T, B, C) or (B, T, C) logits → (ids, probs) argmax over classes."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)


def ctc_greedy_decode(ids: np.ndarray, probs: np.ndarray = None,
                      alphabet: Sequence[str] = None, blank: int = 0,
                      merge_repeats: bool = True):
    """ids: (T,) per-timestep class ids → (text, mean_conf).

    Matches the reference semantics: collapse repeats, drop blanks
    (crnn "sim" mode; ppocr ctcDecode)."""
    out: List[str] = []
    confs: List[float] = []
    prev = -1
    for t, c in enumerate(np.asarray(ids).tolist()):
        if c != blank and not (merge_repeats and c == prev):
            out.append(alphabet[c] if alphabet else str(c))
            if probs is not None:
                confs.append(float(probs[t]))
        prev = c
    conf = float(np.mean(confs)) if confs else 0.0
    return "".join(out), conf
