"""PP-FormulaNet pipeline: image → LaTeX.

Reference: ppocrv5/ppocrv5_formula.cpp —
  preprocessFormula (:438-492): gray min-max normalize → threshold<200
  bounding-box crop → keep-ratio resize → center pad to 768x768 →
  gray = 0.114r+0.587g+0.299b → (g/255 - 0.7931)/0.1738;
  FormulaTokenizer (:256-437): YAML vocab + byte-level BPE decode +
  whitespace-collapsing postprocess;
  decode loop (:645-766) — on-device in models/ppocr_formula.decode.
"""

from __future__ import annotations

import re
from typing import List, Sequence

import numpy as np

from tensorrtx_tpu.models.ppocr_formula import BOS_ID, EOS_ID

MEAN = 0.7931
STD = 0.1738


def preprocess(image: np.ndarray, input_h: int = 768,
               input_w: int = 768) -> np.ndarray:
    """image: (H, W, 3) uint8 RGB → (1, input_h, input_w, 1) float32."""
    img = np.asarray(image)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    r = img[..., 0].astype(np.float32)
    g = img[..., 1].astype(np.float32)
    b = img[..., 2].astype(np.float32)
    gray = 0.299 * r + 0.587 * g + 0.114 * b  # cv2 BGR2GRAY on RGB order

    lo, hi = float(gray.min()), float(gray.max())
    y0, y1, x0, x1 = 0, img.shape[0], 0, img.shape[1]
    if hi > lo:
        norm = (gray - lo) * (255.0 / (hi - lo))
        ys, xs = np.nonzero(norm < 200.0)
        if len(ys):
            y0, y1 = int(ys.min()), int(ys.max()) + 1
            x0, x1 = int(xs.min()), int(xs.max()) + 1
    crop = img[y0:y1, x0:x1]

    ch, cw = crop.shape[:2]
    scale = min(input_w / cw, input_h / ch)
    rw = max(1, int(round(cw * scale)))
    rh = max(1, int(round(ch * scale)))
    # bilinear resize via PIL-free numpy (separable linear interp)
    yy = np.linspace(0, ch - 1, rh)
    xx = np.linspace(0, cw - 1, rw)
    yi = np.clip(yy.astype(int), 0, ch - 2)
    xi = np.clip(xx.astype(int), 0, cw - 2)
    fy = (yy - yi)[:, None, None]
    fx = (xx - xi)[None, :, None]
    c = crop.astype(np.float32)
    top = c[yi][:, xi] * (1 - fx) + c[yi][:, xi + 1] * fx
    bot = c[yi + 1][:, xi] * (1 - fx) + c[yi + 1][:, xi + 1] * fx
    resized = top * (1 - fy) + bot * fy

    padded = np.zeros((input_h, input_w, 3), np.float32)
    py = (input_h - rh) // 2
    px = (input_w - rw) // 2
    padded[py:py + rh, px:px + rw] = resized

    # reference reads BGR and mixes 0.114·[2] + 0.587·[1] + 0.299·[0]
    # = 0.114·R + 0.587·G + 0.299·B given our RGB layout
    # (ppocrv5_formula.cpp:484-488)
    gray_in = (0.114 * padded[..., 0] + 0.587 * padded[..., 1]
               + 0.299 * padded[..., 2])
    out = (gray_in / 255.0 - MEAN) / STD
    return out[None, :, :, None].astype(np.float32)


def _build_byte_decoder():
    """GPT-2 byte↔unicode table (ppocrv5_formula.cpp:256-283)."""
    bs = list(range(ord("!"), ord("~") + 1)) + \
        list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class FormulaTokenizer:
    """Byte-level BPE detokenizer from a Paddle inference.yml vocab."""

    def __init__(self, yaml_path: str = None, vocab: dict = None,
                 special_ids: Sequence[int] = ()):
        self.id_to_token: dict = {}
        self.special_ids = set(special_ids)
        if yaml_path is not None:
            self._load_yaml(yaml_path)
        elif vocab is not None:
            self.id_to_token = {int(i): t for t, i in vocab.items()}
        self.byte_decoder = _build_byte_decoder()

    def _load_yaml(self, path: str):
        with open(path, encoding="utf-8") as f:
            lines = [ln.rstrip("\r\n") for ln in f]
        content = None
        in_vocab = False
        vocab_indent = -1
        for line in lines:
            t = line.strip()
            if t.startswith("- content:"):
                content = _unquote(t[len("- content:"):])
                continue
            if content is not None and t.startswith("id:"):
                tid = int(t[3:].strip())
                self.id_to_token[tid] = content
                self.special_ids.add(tid)
                content = None
                continue
            if not in_vocab:
                if t == "vocab:":
                    in_vocab = True
                    vocab_indent = len(line) - len(line.lstrip(" "))
                continue
            if not t:
                continue
            indent = len(line) - len(line.lstrip(" "))
            if indent <= vocab_indent:
                in_vocab = False
                continue
            sep = t.rfind(": ")
            if sep < 0:
                continue
            token = _unquote(t[:sep])
            self.id_to_token[int(t[sep + 2:].strip())] = token

    def decode(self, ids: Sequence[int]) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i == EOS_ID:
                break
            if i in self.special_ids or i == BOS_ID:
                continue
            tok = self.id_to_token.get(i)
            if tok is None:
                continue
            out.append("".join(
                chr(self.byte_decoder[ch]) if ch in self.byte_decoder else ""
                for ch in tok))
        return self._postprocess("".join(out))

    @staticmethod
    def _postprocess(text: str) -> str:
        """Collapse spaces not between two latin letters
        (ppocrv5_formula.cpp:419-431)."""
        text = re.sub(r"\\text\s*\{([^{}]*)\}", r"\\text{\1}", text)
        changed = True
        while changed:
            old = text
            text = re.sub(r"([^A-Za-z])\s+([^A-Za-z])", r"\1\2", text)
            text = re.sub(r"([^A-Za-z])\s+([A-Za-z])", r"\1\2", text)
            text = re.sub(r"([A-Za-z])\s+([^A-Za-z])", r"\1\2", text)
            changed = text != old
        return text.strip()


def _unquote(raw: str) -> str:
    t = raw.strip()
    if len(t) >= 2 and t[0] == t[-1] == "'":
        return t[1:-1].replace("''", "'")
    if len(t) >= 2 and t[0] == t[-1] == '"':
        return t[1:-1].encode().decode("unicode_escape")
    return t


class FormulaPipeline:
    """image(s) → LaTeX using a jitted encoder+decoder engine."""

    def __init__(self, engine, tokenizer: FormulaTokenizer, cfg=None):
        self.engine = engine
        self.tokenizer = tokenizer
        self.cfg = cfg or engine.cfg

    def __call__(self, image: np.ndarray) -> dict:
        x = preprocess(image, self.cfg.input_h, self.cfg.input_w)
        ids, length = self.engine(x)
        ids = np.asarray(ids)[: int(length)].tolist()
        return {"ids": ids, "tokens": len(ids),
                "latex": self.tokenizer.decode(ids)}
