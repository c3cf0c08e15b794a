"""RetinaFace-R50 face detector with 5-point landmarks.

Reference: retinaface/retina_r50.cpp (bottleneck:26, conv_bn_relu:69, ssh:87,
createEngine:101-230) and retinaface/decode.cu:110-189 (DecodePlugin):
prior-box decode with variances (0.1, 0.2), 2 anchors/cell at 3 FPN strides
(8/16/32 with anchor sizes 16/32, 64/128, 256/512), softmax 2-class conf,
candidate gate 0.02. The atomic-append plugin becomes a dense decode + top-k
+ NMS fused into the program.

Weights: biubug6/Pytorch_Retinaface state_dict (body.*, fpn.output{1-3},
fpn.merge{1,2}, ssh{1-3}, {Bbox,Class,Landmark}Head.{0-2}.conv1x1).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.detect import bexp
from tensorrtx_tpu.ops.nms import select_and_nms

BN_EPS = 1e-5
ANCHORS = ((16, 32), (64, 128), (256, 512))
STRIDES = (8, 16, 32)
VARIANCE = (0.1, 0.2)


@dataclasses.dataclass
class RetinaFaceCfg:
    input_h: int = 480
    input_w: int = 640
    conf_thresh: float = 0.5     # retina_r50.cpp CONF_THRESH path
    cand_thresh: float = 0.02    # plugin gate (decode.cu:131)
    nms_thresh: float = 0.4
    max_det: int = 300
    postprocess: str = "nms"     # "nms" | "raw"


def _cbr(wm, name, co, ci, k):
    return wm.conv_bn(f"{name}.0", f"{name}.1", co, ci, (k, k), eps=BN_EPS)


def _bottleneck_p(wm, prefix, inch, outch, with_down):
    p = {
        "c1": wm.conv_bn(f"{prefix}conv1", f"{prefix}bn1", outch, inch, (1, 1), eps=BN_EPS),
        "c2": wm.conv_bn(f"{prefix}conv2", f"{prefix}bn2", outch, outch, (3, 3), eps=BN_EPS),
        "c3": wm.conv_bn(f"{prefix}conv3", f"{prefix}bn3", outch * 4, outch, (1, 1), eps=BN_EPS),
    }
    if with_down:
        p["down"] = wm.conv_bn(f"{prefix}downsample.0", f"{prefix}downsample.1",
                               outch * 4, inch, (1, 1), eps=BN_EPS)
    return p


def _ssh_p(wm, name):
    return {
        "c3x3": _cbr(wm, f"{name}.conv3X3", 128, 256, 3),
        "c5_1": _cbr(wm, f"{name}.conv5X5_1", 64, 256, 3),
        "c5_2": _cbr(wm, f"{name}.conv5X5_2", 64, 64, 3),
        "c7_2": _cbr(wm, f"{name}.conv7X7_2", 64, 64, 3),
        "c7_3": _cbr(wm, f"{name}.conv7x7_3", 64, 64, 3),
    }


def build_params(wm, cfg: RetinaFaceCfg):
    layers = [3, 4, 6, 3]
    p = {"stem": wm.conv_bn("body.conv1", "body.bn1", 64, 3, (7, 7), eps=BN_EPS)}
    stages = []
    inch = 64
    for li, n in enumerate(layers):
        outch = 64 * (2 ** li)
        blocks = []
        for bi in range(n):
            blocks.append(_bottleneck_p(wm, f"body.layer{li + 1}.{bi}.", inch,
                                        outch, bi == 0))
            inch = outch * 4
        stages.append(blocks)
    p["stages"] = stages
    p["out1"] = _cbr(wm, "fpn.output1", 256, 512, 1)
    p["out2"] = _cbr(wm, "fpn.output2", 256, 1024, 1)
    p["out3"] = _cbr(wm, "fpn.output3", 256, 2048, 1)
    p["merge1"] = _cbr(wm, "fpn.merge1", 256, 256, 3)
    p["merge2"] = _cbr(wm, "fpn.merge2", 256, 256, 3)
    p["ssh"] = [_ssh_p(wm, f"ssh{i + 1}") for i in range(3)]
    p["bbox"] = [wm.conv2d(f"BboxHead.{i}.conv1x1", 8, 256, (1, 1)) for i in range(3)]
    p["cls"] = [wm.conv2d(f"ClassHead.{i}.conv1x1", 4, 256, (1, 1)) for i in range(3)]
    p["lmk"] = [wm.conv2d(f"LandmarkHead.{i}.conv1x1", 20, 256, (1, 1)) for i in range(3)]
    return p


def _bottleneck_a(p, x, stride):
    z = jax.nn.relu(nn.conv2d(x, p["c1"]["w"], p["c1"]["b"]))
    z = jax.nn.relu(nn.conv2d(z, p["c2"]["w"], p["c2"]["b"], stride=stride, padding=1))
    z = nn.conv2d(z, p["c3"]["w"], p["c3"]["b"])
    sc = x if "down" not in p else nn.conv2d(x, p["down"]["w"], p["down"]["b"], stride=stride)
    return jax.nn.relu(z + sc)


def _cbr_a(p, x, relu=True, stride=1):
    k = p["w"].shape[0]
    y = nn.conv2d(x, p["w"], p["b"], stride=stride, padding=k // 2)
    return jax.nn.relu(y) if relu else y


def _ssh_a(p, x):
    a = _cbr_a(p["c3x3"], x, relu=False)
    b1 = _cbr_a(p["c5_1"], x)
    b = _cbr_a(p["c5_2"], b1, relu=False)
    c = _cbr_a(p["c7_2"], b1)
    c = _cbr_a(p["c7_3"], c, relu=False)
    return jax.nn.relu(jnp.concatenate([a, b, c], axis=-1))


def decode_level(bbox, cls, lmk, stride, anchors, input_h, input_w):
    """decode.cu:110-175 semantics, dense over all cells × 2 anchors."""
    b, h, w, _ = bbox.shape
    bb = bbox.reshape(b, h, w, 2, 4).astype(jnp.float32)
    cl = cls.reshape(b, h, w, 2, 2).astype(jnp.float32)
    lm = lmk.reshape(b, h, w, 2, 10).astype(jnp.float32)
    conf = jax.nn.softmax(cl, axis=-1)[..., 1]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    px = xs[None, None, :, None]
    py = ys[None, :, None, None]
    pw = jnp.asarray(anchors, jnp.float32)[None, None, None, :] / input_w
    ph = jnp.asarray(anchors, jnp.float32)[None, None, None, :] / input_h
    cx = px + bb[..., 0] * VARIANCE[0] * pw
    cy = py + bb[..., 1] * VARIANCE[0] * ph
    bw = pw * bexp(bb[..., 2] * VARIANCE[1])
    bh = ph * bexp(bb[..., 3] * VARIANCE[1])
    x1 = (cx - bw / 2) * input_w
    y1 = (cy - bh / 2) * input_h
    x2 = x1 + bw * input_w
    y2 = y1 + bh * input_h
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    lmx = (px[..., None] + lm[..., 0::2] * VARIANCE[0] * pw[..., None]) * input_w
    lmy = (py[..., None] + lm[..., 1::2] * VARIANCE[0] * ph[..., None]) * input_h
    lms = jnp.stack([lmx, lmy], axis=-1).reshape(b, h, w, 2, 10)
    n = h * w * 2
    return (boxes.reshape(b, n, 4), conf.reshape(b, n), lms.reshape(b, n, 10))


def apply(params, x, cfg: RetinaFaceCfg):
    # 7×7 s2 stem as a block conv on the 2×2 s2d input (see
    # models/resnet.backbone_apply stem_s2d — identical numerics)
    y = nn.conv2d_s2d(nn.space_to_depth2(x),
                      nn.s2d_conv_weights(params["stem"]["w"], padding=3),
                      params["stem"]["b"])
    y = jax.nn.relu(y)
    y = nn.max_pool(y, 3, 2, 1)
    feats = []
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            y = _bottleneck_a(bp, y, stride if bi == 0 else 1)
        feats.append(y)
    _, c2, c3, c4 = feats
    o1 = _cbr_a(params["out1"], c2)
    o2 = _cbr_a(params["out2"], c3)
    o3 = _cbr_a(params["out3"], c4)
    o2 = _cbr_a(params["merge2"], o2 + nn.upsample_nearest(o3))
    o1 = _cbr_a(params["merge1"], o1 + nn.upsample_nearest(o2))
    sshs = [_ssh_a(params["ssh"][i], f) for i, f in enumerate([o1, o2, o3])]

    all_boxes, all_conf, all_lmk = [], [], []
    for i, f in enumerate(sshs):
        bbox = nn.conv2d(f, params["bbox"][i]["w"], params["bbox"][i]["b"])
        cls = nn.conv2d(f, params["cls"][i]["w"], params["cls"][i]["b"])
        lmk = nn.conv2d(f, params["lmk"][i]["w"], params["lmk"][i]["b"])
        bx, cf, lm = decode_level(bbox, cls, lmk, STRIDES[i], ANCHORS[i],
                                  cfg.input_h, cfg.input_w)
        all_boxes.append(bx)
        all_conf.append(cf)
        all_lmk.append(lm)
    boxes = jnp.concatenate(all_boxes, 1)
    conf = jnp.concatenate(all_conf, 1)
    lmks = jnp.concatenate(all_lmk, 1)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "landmarks": lmks}
    classes = jnp.zeros_like(conf)
    dets = select_and_nms(boxes, conf, classes, cfg.conf_thresh, cfg.nms_thresh,
                          cfg.max_det, extras=lmks)
    return dets.as_dict()


register(ModelDef(
    name="retinaface",
    build_params=build_params,
    apply=apply,
    default_cfg=RetinaFaceCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="RetinaFace-R50 face detection + landmarks (reference: retinaface/)",
))
