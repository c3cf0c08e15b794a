"""PP-OCRv5 system: the multi-mode document-AI app.

Reference: ppocrv5/ppocr_system.cpp — modes -ocr/-classify/-layout/-table/
-uvdoc/-formula/-all over an engine directory (:1260-1291), det→rec OCR
pair (:619-658), generic model runner with per-model input shapes
(:436-495), tensor summaries (:534-548).

TPU redesign: each "engine" is a registry ModelDef jitted once per shape
bucket; the det long-side resize and rec width bucketing keep shapes static
(the TRT optimization-profile analog).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence

import numpy as np

from tensorrtx_tpu.pipelines._imaging import bilinear_resize

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

REC_H = 48
REC_MIN_W, REC_MAX_W = 160, 3200
DET_RESIZE_LONG = 960


def load_rec_dictionary(path: str) -> List[str]:
    """rec dict: plain txt (one char per line) or an inference.yml with a
    character_dict: block; a trailing space entry is appended
    (ppocrv5/src/utils.cpp:160-182)."""
    with open(path, encoding="utf-8") as f:
        lines = [ln.rstrip("\r\n") for ln in f]
    dict_chars: List[str] = []
    in_block = False
    for ln in lines:
        t = ln.strip()
        if t == "character_dict:":
            in_block = True
            continue
        if in_block:
            if t.startswith("- "):
                v = t[2:].strip()
                if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                    v = v[1:-1]
                dict_chars.append(v)
                continue
            if t and not t.startswith("-"):
                in_block = False
    if not dict_chars:
        dict_chars = lines
    if not dict_chars or dict_chars[-1] != " ":
        dict_chars.append(" ")
    return dict_chars


def det_resize_shape(h: int, w: int, resize_long: int = DET_RESIZE_LONG):
    """Long side → resize_long, both dims rounded to multiples of 32."""
    scale = resize_long / max(h, w)
    nh = max(32, int(round(h * scale / 32)) * 32)
    nw = max(32, int(round(w * scale / 32)) * 32)
    return nh, nw


def det_preprocess(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize + PP-OCR det normalization (preprocess.cu:65-96)."""
    im = bilinear_resize(image.astype(np.float32), out_h, out_w) / 255.0
    im = (im - IMAGENET_MEAN) / IMAGENET_STD
    return im[None].astype(np.float32)


def rec_width_bucket(w: int, step: int = 320) -> int:
    """Static width buckets 160, 320, 640, … 3200 (≙ the TRT rec
    optimization profile min/opt/max, model.cpp:101-107)."""
    if w <= REC_MIN_W:
        return REC_MIN_W
    b = int(np.ceil(w / step)) * step
    return int(min(b, REC_MAX_W))


def rec_preprocess(crop: np.ndarray, bucket_w: int) -> np.ndarray:
    """Aspect bilinear resize to H=48, zero pad to the width bucket,
    (x/127.5 − 1) normalization (preprocess.cu:97-124)."""
    h, w = crop.shape[:2]
    new_w = min(max(1, int(round(w * REC_H / h))), bucket_w)
    resized = bilinear_resize(crop.astype(np.float32), REC_H, new_w)
    if resized.ndim == 2:
        resized = np.stack([resized] * 3, -1)
    buf = np.zeros((REC_H, bucket_w, 3), np.float32)
    buf[:, :new_w] = resized / 127.5 - 1.0
    return buf[None]


def make_ppocr_det_fn(engine, resize_long: int = DET_RESIZE_LONG):
    """engine: ppocrv5_det / ppocrv5_server_det. Returns det_fn(image) →
    [(box (4,2) in ORIGINAL image coords, score)]."""
    from tensorrtx_tpu.ops.db import db_boxes_from_prob

    cfg = engine.cfg

    def det(image: np.ndarray):
        h, w = image.shape[:2]
        nh, nw = det_resize_shape(h, w, resize_long)
        x = det_preprocess(image, nh, nw)
        prob = np.asarray(engine(x, shape_key=(nh, nw)))[0, :, :, 0]
        boxes = db_boxes_from_prob(prob, cfg.bin_thresh, cfg.box_thresh,
                                   cfg.unclip_ratio)
        sx, sy = w / nw, h / nh
        out = []
        for b, score in boxes:
            b = np.asarray(b, np.float32)
            b[:, 0] = np.clip(b[:, 0] * sx, 0, w - 1)
            b[:, 1] = np.clip(b[:, 1] * sy, 0, h - 1)
            out.append((b, score))
        return out

    return det


def make_ppocr_rec_fn(engine, dictionary: Sequence[str]):
    """engine: ppocrv5_rec / ppocrv5_server_rec. Returns rec_fn(crop) →
    (text, conf) with the reference CTC dict convention (id-1 indexing,
    blank=0; postprocess.cpp:162-186)."""

    def rec(crop: np.ndarray):
        bucket = rec_width_bucket(
            int(round(crop.shape[1] * REC_H / max(crop.shape[0], 1))))
        x = rec_preprocess(crop, bucket)
        probs = np.asarray(engine(x, shape_key=bucket))[0]  # (T, C)
        ids = probs.argmax(-1)
        text = []
        confs = []
        last = -1
        for t, idx in enumerate(ids):
            if idx != 0 and idx != last and 0 <= idx - 1 < len(dictionary):
                text.append(dictionary[idx - 1])
                confs.append(probs[t, idx])
            last = idx
        return "".join(text), float(np.mean(confs)) if confs else 0.0

    return rec


class _BucketedEngine:
    """Wrap an Engine, re-jitting per static shape bucket (dynamic-shape
    optimization profiles ≙ a jit cache keyed by bucket)."""

    def __init__(self, model, params, cfg):
        import jax

        self.model = model
        self.params = params
        self.cfg = cfg
        self._jit = jax.jit(lambda p, x: model.apply(p, x, cfg))

    def __call__(self, x, shape_key=None):
        return self._jit(self.params, x)


def build_model(name: str, wts_path: Optional[str] = None, seed: int = 0,
                **overrides):
    """Registry model + .wts (or random weights) → callable engine."""
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.registry import get_model

    model = get_model(name)
    cfg = model.default_cfg()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if wts_path:
        from tensorrtx_tpu.core.params import WeightMap
        from tensorrtx_tpu.core.wts import load_wts

        wm = WeightMap(load_wts(wts_path))
    else:
        from tensorrtx_tpu.core.random_weights import RandomWeightMap

        wm = RandomWeightMap(seed=seed)
    params = jax.tree.map(jnp.asarray, model.build_params(wm, cfg))
    return _BucketedEngine(model, params, cfg)


@dataclasses.dataclass
class OcrLine:
    box: np.ndarray
    text: str
    confidence: float


def run_ocr(det_engine, rec_engine, image: np.ndarray,
            dictionary: Sequence[str], min_score: float = 0.3):
    """det → sort → rotate-crop → rec (ppocr_system.cpp:619-658)."""
    from tensorrtx_tpu.pipelines.ocr import rotate_crop, sort_boxes

    det_fn = make_ppocr_det_fn(det_engine)
    rec_fn = make_ppocr_rec_fn(rec_engine, dictionary)
    dets = [(b, s) for b, s in det_fn(image) if s >= min_score]
    boxes = [b for b, _ in dets]
    results = []
    for i in sort_boxes(boxes):
        crop = rotate_crop(image, boxes[i])
        text, conf = rec_fn(crop)
        if text:
            results.append(OcrLine(boxes[i], text, conf))
    return results


# ---- generic model runner (system -model/-classify/-layout/-table/-uvdoc) --

_MODEL_INPUT = {
    "pp_lcnet_x1_0_doc_ori": (224, 224),
    "pp_lcnet_x1_0_table_cls": (224, 224),
    "pp_lcnet_x1_0_textline_ori": (80, 160),
    "pp_doclayout_plus_l": (800, 800),
    "pp_docblocklayout": (640, 640),
    "slanet_plus": (800, 800),
    "slanext_wired": (512, 512),
    "uvdoc": (800, 800),
    "rt_detr_l_wired_table_cell_det": (640, 640),
    "rt_detr_l_wireless_table_cell_det": (640, 640),
}

MODE_MODELS = {
    "classify": ["pp_lcnet_x1_0_doc_ori", "pp_lcnet_x1_0_table_cls",
                 "pp_lcnet_x1_0_textline_ori"],
    "layout": ["pp_docblocklayout", "pp_doclayout_plus_l"],
    "table": ["rt_detr_l_wired_table_cell_det",
              "rt_detr_l_wireless_table_cell_det", "slanet_plus",
              "slanext_wired"],
    "uvdoc": ["uvdoc"],
}


def generic_preprocess(model_name: str, image: np.ndarray) -> np.ndarray:
    """normalizeImageToChw (ppocr_system.cpp:416-438): resize + imagenet
    normalization — NHWC here. uvdoc takes [0,1] RGB instead."""
    h, w = _MODEL_INPUT.get(model_name, (640, 640))
    im = bilinear_resize(image.astype(np.float32), h, w) / 255.0
    if model_name == "uvdoc":
        return im[None].astype(np.float32)
    im = (im - IMAGENET_MEAN) / IMAGENET_STD
    return im[None].astype(np.float32)


def run_generic(engine, model_name: str, image: np.ndarray):
    x = generic_preprocess(model_name, image)
    out = engine(x)
    model = engine.model
    if model.postprocess is not None:
        try:
            return model.postprocess(out, engine.cfg)
        except TypeError:
            pass
    return out


def summarize(out) -> str:
    """printTensorSummary-style one-liner (ppocr_system.cpp:534-548)."""
    import jax

    parts = []
    for leaf in jax.tree.leaves(out):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and a.size:
            parts.append(f"shape={list(a.shape)} min={a.min():.4f} "
                         f"max={a.max():.4f} mean={a.mean():.4f}")
        else:
            parts.append(f"shape={list(a.shape)} dtype={a.dtype}")
    return " | ".join(parts)


def read_images(path: str) -> List[str]:
    exts = (".jpg", ".jpeg", ".png", ".bmp", ".pgm", ".ppm")
    if os.path.isfile(path):
        return [path]
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.lower().endswith(exts))
