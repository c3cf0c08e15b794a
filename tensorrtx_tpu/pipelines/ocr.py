"""OCR pipeline: text detection → rotate-crop → recognition → text.

Reference: ppocrv5/ppocr_system.cpp runOcrPair (:619-658) — det engine finds
text boxes (DB postprocess), each box is perspective-cropped, resized to the
rec height and run through the recognizer, CTC-decoded against a dictionary.

This pipeline is engine-agnostic: any det ModelDef producing a prob map +
DB postprocess (dbnet today, ppocrv5 det later) composes with any CTC rec
model (crnn today, SVTR rec later). Width bucketing keeps shapes static per
bucket (the TPU answer to TRT rec-width optimization profiles,
ppocrv5/src/model.cpp:93-108).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["OcrPipeline", "rotate_crop", "sort_boxes"]


def rotate_crop(img: np.ndarray, box: np.ndarray) -> np.ndarray:
    """Crop a (possibly rotated) 4-point box via inverse-affine bilinear
    sampling (the getPerspectiveTransform analog for rectangular boxes)."""
    box = np.asarray(box, np.float32)
    w = int(round(np.linalg.norm(box[1] - box[0])))
    h = int(round(np.linalg.norm(box[3] - box[0])))
    w, h = max(w, 1), max(h, 1)
    # affine: dst (x, y) → src = o + x/w * ex + y/h * ey
    o = box[0]
    ex = (box[1] - box[0]) / w
    ey = (box[3] - box[0]) / h
    xs = np.arange(w, dtype=np.float32) + 0.5
    ys = np.arange(h, dtype=np.float32) + 0.5
    sx = o[0] + xs[None, :] * ex[0] + ys[:, None] * ey[0] - 0.5
    sy = o[1] + xs[None, :] * ex[1] + ys[:, None] * ey[1] - 0.5
    x0 = np.clip(np.floor(sx).astype(np.int32), 0, img.shape[1] - 1)
    y0 = np.clip(np.floor(sy).astype(np.int32), 0, img.shape[0] - 1)
    x1 = np.clip(x0 + 1, 0, img.shape[1] - 1)
    y1 = np.clip(y0 + 1, 0, img.shape[0] - 1)
    lx = np.clip(sx - x0, 0, 1)
    ly = np.clip(sy - y0, 0, 1)
    if img.ndim == 3:
        lx = lx[..., None]
        ly = ly[..., None]
    im = img.astype(np.float32)
    out = (im[y0, x0] * (1 - lx) * (1 - ly) + im[y0, x1] * lx * (1 - ly)
           + im[y1, x0] * (1 - lx) * ly + im[y1, x1] * lx * ly)
    crop = out.astype(img.dtype)
    # tall boxes are vertical text: rotate to horizontal (ppocr convention)
    if h >= w * 1.5:
        crop = np.rot90(crop, 3)
    return crop


def sort_boxes(boxes: Sequence[np.ndarray]) -> List[int]:
    """Reading order: top-to-bottom then left-to-right (ppocr sorted_boxes)."""
    keys = [(float(b[:, 1].min()), float(b[:, 0].min())) for b in boxes]
    return sorted(range(len(boxes)), key=lambda i: keys[i])


@dataclasses.dataclass
class OcrResult:
    box: np.ndarray
    text: str
    confidence: float


class OcrPipeline:
    """det_fn(image)->[(box, score)]; rec_fn(crop)->(text, conf)."""

    def __init__(self, det_fn: Callable, rec_fn: Callable,
                 min_score: float = 0.3):
        self.det_fn = det_fn
        self.rec_fn = rec_fn
        self.min_score = min_score

    def __call__(self, image: np.ndarray) -> List[OcrResult]:
        dets = [(b, s) for b, s in self.det_fn(image) if s >= self.min_score]
        boxes = [b for b, _ in dets]
        order = sort_boxes(boxes)
        results = []
        for i in order:
            crop = rotate_crop(image, boxes[i])
            text, conf = self.rec_fn(crop)
            if text:
                results.append(OcrResult(boxes[i], text, conf))
        return results


def make_crnn_rec_fn(engine, input_h: int = 32, input_w: int = 100):
    """Adapt a crnn engine into rec_fn: grayscale, aspect resize to H,
    pad/truncate to the static width bucket."""
    from tensorrtx_tpu.models.crnn import ALPHABET
    from tensorrtx_tpu.ops.ctc import ctc_greedy_decode

    def rec(crop: np.ndarray) -> Tuple[str, float]:
        from tensorrtx_tpu.pipelines._imaging import bilinear_resize

        if crop.ndim == 3:
            gray = crop.astype(np.float32).mean(-1)
        else:
            gray = crop.astype(np.float32)
        h, w = gray.shape
        # bilinear aspect resize to the rec height (reference resizes crops
        # bilinearly, ppocrv5/src/preprocess.cu:97; nearest blurs thin glyphs)
        new_w = min(max(int(round(w * input_h / h)), 1), input_w)
        resized = bilinear_resize(gray[..., None], input_h, new_w)[..., 0]
        buf = np.zeros((input_h, input_w), np.float32)
        buf[:, :new_w] = resized
        x = (buf / 255.0 - 0.5) / 0.5
        out = engine(x[None, :, :, None])
        ids = np.asarray(out["ids"])[:, 0]
        probs = np.asarray(out["probs"])[:, 0]
        return ctc_greedy_decode(ids, probs, ALPHABET)

    return rec


def make_dbnet_det_fn(engine, cfg=None):
    """Adapt a dbnet engine into det_fn (normalize, pad to bucket, DB post)."""
    from tensorrtx_tpu.models.dbnet import postprocess

    cfg = cfg or engine.cfg

    def det(image: np.ndarray):
        from tensorrtx_tpu.pipelines._imaging import bilinear_resize

        h, w = image.shape[:2]
        # images larger than the bucket are resized long-side to fit (the
        # reference scales to its det shape, ppocr det preprocess) instead
        # of being cropped; boxes are mapped back to image coords below
        scale = min(1.0, cfg.input_h / h, cfg.input_w / w)
        ch, cw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
        im = image.astype(np.float32)
        if scale < 1.0:
            im = bilinear_resize(im if im.ndim == 3 else im[..., None],
                                 ch, cw)
        im = (im / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        buf = np.zeros((cfg.input_h, cfg.input_w, 3), np.float32)
        buf[:ch, :cw] = im[:ch, :cw]
        prob = engine(buf[None])
        boxes = postprocess(prob, cfg)[0]
        if scale < 1.0:
            boxes = [(np.asarray(b, np.float32) / scale, s) for b, s in boxes]
        # the postprocess clips to the det bucket; for non-square images the
        # bucket edge maps past the original image — clip to (w, h) so
        # downstream rotate_crop never samples outside the image
        boxes = [(np.clip(np.asarray(b, np.float32), 0.0,
                          [w - 1.0, h - 1.0]), s) for b, s in boxes]
        return boxes

    return det
