"""Per-task drivers: preprocess + present for every registered model.

The reference ships one main() per model with task-specific pre/post
(classifier top-k print lenet/lenet.cpp:318-344; detector letterbox+NMS
yolo11_det.cpp:218-252; seg mask save yolo11_seg.cpp; SR image write
real-esrgan.cpp; OCR text print). Here one table assigns each registry
model a task family, and each family provides
  preprocess(image_u8, cfg) -> (model_input, meta)
  present(output, cfg, meta) -> JSON-serializable result
so `cli run` can drive ALL models, not just detectors.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# task families:
#  detect     letterbox → fused decode+NMS buffer (ServingPipeline)
#  classify   resize+center-crop+imagenet → top-5
#  gray_cls   grayscale resize → top-5 (lenet/mlp tutorial models)
#  segment    resize+imagenet → argmax mask stats
#  ocr_det    long-side resize → DB boxes
#  ocr_rec    aspect-resize H → CTC text
#  sr         /255 → output image stats/save
#  embedding  (x/127.5-1) resize → L2-normalized vector
#  tensor     resize+imagenet → float stats (generic fallback)
TASKS: Dict[str, str] = {
    # classifiers
    **{m: "classify" for m in (
        "alexnet", "vgg", "googlenet", "squeezenet", "mnasnet",
        "shufflenetv2", "senet", "repvgg", "densenet", "resnet",
        "mobilenetv2", "mobilenetv3", "inception", "ghostnet", "ibnnet",
        "efficientnet", "hrnet", "vit", "convnextv2", "inceptionv4", "ghostnetv2", "pp_lcnet_x1_0_doc_ori",
        "pp_lcnet_x1_0_table_cls", "pp_lcnet_x1_0_textline_ori")},
    **{m: "gray_cls" for m in ("lenet", "mlp")},
    # detectors (fused letterbox+decode+NMS contract)
    **{m: "detect" for m in (
        "yolov3", "yolov4", "scaled-yolov4", "yolov5", "yolov5-lite",
        "yolov7", "yolov8", "yolov9", "yolo11", "yolov12", "yolov13",
        "yolo26", "yolov10", "yolov3-tiny", "yolop", "refinedet", "retinaface", "retinaface-anticov",
        "rcnn", "detr", "centernet")},
    # segmentation
    **{m: "segment" for m in ("unet", "hrnet-seg", "hrnet-ocr", "swin", "psenet")},
    # OCR
    **{m: "ocr_det" for m in ("dbnet", "ppocrv5_det", "ppocrv5_server_det")},
    **{m: "ocr_rec" for m in ("crnn", "lprnet", "ppocrv5_rec",
                              "ppocrv5_server_rec")},
    # super-resolution / image-to-image
    **{m: "sr" for m in ("real-esrgan", "real-esrgan-x4v3", "uvdoc")},
    # embeddings
    **{m: "embedding" for m in ("arcface", "arcface-mobilefacenet")},
    # generic tensor heads (density map, anomaly map, lanes, keypoints,
    # video, tables, layout, formula — pipeline-level drivers exist
    # separately for ppocr; here they still run and summarize)
    **{m: "tensor" for m in (
        "csrnet", "efficient_ad", "superpoint", "ufld", "tsm",
        "slanet_plus", "slanext_wired", "pp_docblocklayout",
        "pp_doclayout_plus_l", "rt_detr_l_wired_table_cell_det",
        "rt_detr_l_wireless_table_cell_det", "pp_formulanet_plus_l")},
}


def task_for(model_name: str) -> str:
    return TASKS.get(model_name, "tensor")


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from tensorrtx_tpu.pipelines._imaging import bilinear_resize

    return bilinear_resize(img.astype(np.float32), h, w)


def _input_hw(model, cfg) -> Tuple[int, int]:
    shape = model.input_shape(cfg)
    return int(shape[0]), int(shape[1])


def pre_classify(image: np.ndarray, model, cfg):
    """Short-side 256-style resize + center crop + imagenet normalize
    (the torchvision eval transform the reference classifiers assume)."""
    h, w = _input_hw(model, cfg)
    ih, iw = image.shape[:2]
    if (h, w) == (224, 224) and min(ih, iw) > 256:
        scale = 256 / min(ih, iw)
        image = _resize(image, int(round(ih * scale)), int(round(iw * scale)))
        ih, iw = image.shape[:2]
    y0 = max(0, (ih - h) // 2)
    x0 = max(0, (iw - w) // 2)
    crop = image[y0:y0 + h, x0:x0 + w]
    if crop.shape[:2] != (h, w):
        crop = _resize(crop, h, w)
    x = crop.astype(np.float32) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None].astype(np.float32), {}


def present_classify(out, cfg, meta):
    import jax

    probs = np.asarray(jax.tree.leaves(out)[0])[0].astype(np.float64)
    if probs.min() < 0 or probs.sum() > 1.5:  # logits → softmax
        e = np.exp(probs - probs.max())
        probs = e / e.sum()
    top = np.argsort(probs)[::-1][:5]
    return {"top5": [{"class": int(i), "prob": round(float(probs[i]), 5)}
                     for i in top]}


def pre_gray_cls(image: np.ndarray, model, cfg):
    h, w = _input_hw(model, cfg)
    gray = image.astype(np.float32).mean(-1) if image.ndim == 3 \
        else image.astype(np.float32)
    x = _resize(gray, h, w) / 255.0
    return x[None, :, :, None].astype(np.float32), {}


def pre_segment(image: np.ndarray, model, cfg):
    h, w = _input_hw(model, cfg)
    x = _resize(image, h, w) / 255.0
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x[None].astype(np.float32), {"src_hw": image.shape[:2]}


def present_segment(out, cfg, meta):
    import jax

    a = np.asarray(jax.tree.leaves(out)[0])[0]
    if a.ndim == 3 and a.shape[-1] > 1:
        mask = a.argmax(-1)
    else:
        mask = (a[..., 0] > 0.5).astype(np.int32)
    ids, counts = np.unique(mask, return_counts=True)
    return {"mask_shape": list(mask.shape),
            "classes": {int(i): int(c) for i, c in zip(ids, counts)}}


def pre_sr(image: np.ndarray, model, cfg):
    h, w = _input_hw(model, cfg)
    x = _resize(image, h, w) / 255.0
    return x[None].astype(np.float32), {}


def present_sr(out, cfg, meta):
    import jax

    a = np.asarray(jax.tree.leaves(out)[0])[0]
    return {"output_shape": list(a.shape),
            "range": [round(float(a.min()), 4), round(float(a.max()), 4)]}


def pre_embedding(image: np.ndarray, model, cfg):
    h, w = _input_hw(model, cfg)
    x = _resize(image, h, w) / 127.5 - 1.0  # arcface convention
    return x[None].astype(np.float32), {}


def present_embedding(out, cfg, meta):
    import jax

    v = np.asarray(jax.tree.leaves(out)[0]).ravel().astype(np.float64)
    n = np.linalg.norm(v)
    return {"dim": int(v.size), "l2_norm": round(float(n), 4),
            "head": [round(float(x), 5) for x in (v / max(n, 1e-9))[:8]]}


def pre_ocr_det(image: np.ndarray, model, cfg):
    from tensorrtx_tpu.pipelines.ppocr_system import (det_preprocess,
                                                      det_resize_shape)

    nh, nw = det_resize_shape(*image.shape[:2])
    return det_preprocess(image, nh, nw), {"src_hw": image.shape[:2],
                                           "net_hw": (nh, nw)}


def present_ocr_det(out, cfg, meta, model=None):
    prob = np.asarray(out)
    boxes = []
    if model is not None and model.postprocess is not None:
        for b, s in model.postprocess(prob, cfg)[0]:
            sh, sw = meta["src_hw"]
            nh, nw = meta["net_hw"]
            b = np.asarray(b, np.float32)
            b[:, 0] *= sw / nw
            b[:, 1] *= sh / nh
            boxes.append({"box": np.round(b, 1).tolist(),
                          "score": round(float(s), 4)})
    return {"boxes": boxes}


def pre_ocr_rec(image: np.ndarray, model, cfg):
    from tensorrtx_tpu.pipelines.ppocr_system import (rec_preprocess,
                                                      rec_width_bucket)

    h, w = _input_hw(model, cfg)
    if h == 48:  # ppocr rec family
        bucket = rec_width_bucket(
            int(round(image.shape[1] * 48 / max(image.shape[0], 1))))
        return rec_preprocess(image, bucket), {}
    gray = image.astype(np.float32).mean(-1)
    x = _resize(gray, h, w)
    x = (x / 255.0 - 0.5) / 0.5
    return x[None, :, :, None].astype(np.float32), {}


def present_tensor(out, cfg, meta):
    import jax

    stats = []
    for leaf in jax.tree.leaves(out):
        a = np.asarray(leaf)
        entry = {"shape": list(a.shape), "dtype": str(a.dtype)}
        if a.dtype.kind == "f" and a.size:
            entry.update(min=round(float(a.min()), 4),
                         max=round(float(a.max()), 4),
                         mean=round(float(a.mean()), 4))
        stats.append(entry)
    return {"outputs": stats}


PREPROCESS: Dict[str, Callable] = {
    "classify": pre_classify,
    "gray_cls": pre_gray_cls,
    "segment": pre_segment,
    "sr": pre_sr,
    "embedding": pre_embedding,
    "ocr_det": pre_ocr_det,
    "ocr_rec": pre_ocr_rec,
    "tensor": pre_segment,  # imagenet-normalized resize is the sane default
}

PRESENT: Dict[str, Callable] = {
    "classify": present_classify,
    "gray_cls": present_classify,
    "segment": present_segment,
    "sr": present_sr,
    "embedding": present_embedding,
    "tensor": present_tensor,
    "ocr_rec": present_tensor,
}


def run_task(engine, image: np.ndarray) -> dict:
    """Drive any non-detector engine on one image (detect uses
    ServingPipeline's fused path instead)."""
    import jax

    model, cfg = engine.model, engine.cfg
    task = task_for(model.name)
    pre = PREPROCESS.get(task, pre_segment)
    x, meta = pre(image, model, cfg)
    out = engine(x)
    if task == "ocr_det":
        return {"task": task, **present_ocr_det(out, cfg, meta, model=model)}
    if task == "ocr_rec":
        if model.postprocess is not None:
            try:
                res = model.postprocess(out, cfg)
                return {"task": task, "result": _jsonable(res)}
            except TypeError:
                pass
        if isinstance(out, dict) and "ids" in out and "probs" in out:
            # crnn-style raw CTC output: greedy decode against the model's
            # alphabet (crnn/crnn.cpp "raw/sim" strings)
            from tensorrtx_tpu.ops.ctc import ctc_greedy_decode

            charset = None
            if model.name == "crnn":
                from tensorrtx_tpu.models.crnn import ALPHABET

                charset = ALPHABET
            ids = np.asarray(out["ids"])[:, 0]
            probs = np.asarray(out["probs"])[:, 0]
            text, conf = ctc_greedy_decode(ids, probs, charset)
            return {"task": task,
                    "result": {"text": text, "conf": round(float(conf), 4)}}
    present = PRESENT.get(task, present_tensor)
    return {"task": task, **present(out, cfg, meta)}


def _jsonable(x):
    if isinstance(x, np.ndarray):
        return x.tolist()
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (np.integer,)):
        return int(x)
    if isinstance(x, (np.floating,)):
        return float(x)
    return x
