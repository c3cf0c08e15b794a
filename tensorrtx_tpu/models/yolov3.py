"""YOLOv3 / YOLOv3-SPP / YOLOv3-tiny (anchor-based, Darknet).

Reference: yolov3/yolov3.cpp:199-360 (full Darknet-53 expansion with
module_list.N.Conv2d/BatchNorm2d naming from the ultralytics-yolov3 archive
exporter), yolov3/yololayer.cu (decode: xy = (cell + σ)·stride,
wh = exp(t)·anchor, conf = σ(obj)·max σ(cls), obj gate 0.1),
yolov3-spp/ adds an SPP block on the stride-32 head.

The 90-call builder becomes one table: darknet53 = stem + 5 stages of
(downsample conv, n × [1×1 half, 3×3 full, add]).
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

BN_EPS = 1e-5

# (down_idx, channels, num_res): residual i uses convs down+1+3i, down+2+3i
STAGES = [(1, 64, 1), (5, 128, 2), (12, 256, 8), (37, 512, 8), (62, 1024, 4)]
ANCHORS = np.array([[[116, 90], [156, 198], [373, 326]],
                    [[30, 61], [62, 45], [59, 119]],
                    [[10, 13], [16, 30], [33, 23]]], np.float32)
STRIDES = (32, 16, 8)


@dataclasses.dataclass
class Yolov3Cfg:
    num_classes: int = 80
    input_h: int = 608
    input_w: int = 608
    conf_thresh: float = 0.5
    nms_thresh: float = 0.4
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"
    spp: bool = False


def _cbl(wm, idx, co, ci, k):
    return wm.conv_bn(f"module_list.{idx}.Conv2d",
                      f"module_list.{idx}.BatchNorm2d", co, ci, (k, k),
                      eps=BN_EPS)


def _head_conv(wm, idx, co, ci):
    return wm.conv2d(f"module_list.{idx}.Conv2d", co, ci, (1, 1))


def build_params(wm, cfg: Yolov3Cfg):
    no = 3 * (5 + cfg.num_classes)
    p = {"c0": _cbl(wm, 0, 32, 3, 3), "stages": []}
    cin = 32
    for down, ch, n in STAGES:
        st = {"down": _cbl(wm, down, ch, cin, 3), "res": []}
        for i in range(n):
            st["res"].append((
                _cbl(wm, down + 1 + 3 * i, ch // 2, ch, 1),
                _cbl(wm, down + 2 + 3 * i, ch, ch // 2, 3)))
        p["stages"].append(st)
        cin = ch
    if not cfg.spp:
        # plain yolov3: head convs 75-80, det 81; routes 84/96
        p["h0"] = [_cbl(wm, 75, 512, 1024, 1), _cbl(wm, 76, 1024, 512, 3),
                   _cbl(wm, 77, 512, 1024, 1), _cbl(wm, 78, 1024, 512, 3),
                   _cbl(wm, 79, 512, 1024, 1), _cbl(wm, 80, 1024, 512, 3)]
        p["det0"] = _head_conv(wm, 81, no, 1024)
        p["r_mid"] = _cbl(wm, 84, 256, 512, 1)
        p["h1"] = [_cbl(wm, 87, 256, 768, 1), _cbl(wm, 88, 512, 256, 3),
                   _cbl(wm, 89, 256, 512, 1), _cbl(wm, 90, 512, 256, 3),
                   _cbl(wm, 91, 256, 512, 1), _cbl(wm, 92, 512, 256, 3)]
        p["det1"] = _head_conv(wm, 93, no, 512)
        p["r_small"] = _cbl(wm, 96, 128, 256, 1)
        p["h2"] = [_cbl(wm, 99, 128, 384, 1), _cbl(wm, 100, 256, 128, 3),
                   _cbl(wm, 101, 128, 256, 1), _cbl(wm, 102, 256, 128, 3),
                   _cbl(wm, 103, 128, 256, 1), _cbl(wm, 104, 256, 128, 3)]
        p["det2"] = _head_conv(wm, 105, no, 256)
    else:
        # yolov3-spp (yolov3-spp.cpp:297-360): SPP cat after conv 77,
        # then 84-87, det 88; routes 91/103
        p["h0"] = [_cbl(wm, 75, 512, 1024, 1), _cbl(wm, 76, 1024, 512, 3),
                   _cbl(wm, 77, 512, 1024, 1), _cbl(wm, 84, 512, 2048, 1),
                   _cbl(wm, 85, 1024, 512, 3), _cbl(wm, 86, 512, 1024, 1),
                   _cbl(wm, 87, 1024, 512, 3)]
        p["det0"] = _head_conv(wm, 88, no, 1024)
        p["r_mid"] = _cbl(wm, 91, 256, 512, 1)
        p["h1"] = [_cbl(wm, 94, 256, 768, 1), _cbl(wm, 95, 512, 256, 3),
                   _cbl(wm, 96, 256, 512, 1), _cbl(wm, 97, 512, 256, 3),
                   _cbl(wm, 98, 256, 512, 1), _cbl(wm, 99, 512, 256, 3)]
        p["det1"] = _head_conv(wm, 100, no, 512)
        p["r_small"] = _cbl(wm, 103, 128, 256, 1)
        p["h2"] = [_cbl(wm, 106, 128, 384, 1), _cbl(wm, 107, 256, 128, 3),
                   _cbl(wm, 108, 128, 256, 1), _cbl(wm, 109, 256, 128, 3),
                   _cbl(wm, 110, 128, 256, 1), _cbl(wm, 111, 256, 128, 3)]
        p["det2"] = _head_conv(wm, 112, no, 256)
    return p


def _cbl_a(pp, x, stride=1):
    k = pp["w"].shape[0]
    y = nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2)
    return nn.leaky_relu(y, 0.1)


def _decode_level(raw, anchors, stride, nc, ignore_thresh):
    return D.anchor_decode_level_flat(raw, anchors, stride, nc,
                                      ignore_thresh, power=False)


def apply(params, x, cfg: Yolov3Cfg):
    y = _cbl_a(params["c0"], x)
    y = _cbl_a(params["stages"][0]["down"], y, stride=2)
    return _apply_from_down0(params, y, cfg)


def apply_s2d(params, x2, cfg: Yolov3Cfg):
    """Fused-serving fast path from the 2×2 space-to-depth letterbox
    tensor (leaky stem; see models/_yolo_blocks.stem_s1s2_s2d_a)."""
    import tensorrtx_tpu.models._yolo_blocks as B
    lk = lambda v: nn.leaky_relu(v, 0.1)
    y = B.stem_s1s2_s2d_a(params["c0"], params["stages"][0]["down"], x2,
                          act=lk)
    return _apply_from_down0(params, y, cfg)


apply_s2d.factor = 2


def _apply_from_down0(params, y, cfg: Yolov3Cfg):
    feats = []
    for si, st in enumerate(params["stages"]):
        if si > 0:
            y = _cbl_a(st["down"], y, stride=2)
        for c1, c2 in st["res"]:
            y = y + _cbl_a(c2, _cbl_a(c1, y))
        feats.append(y)
    c3, c4, c5 = feats[2], feats[3], feats[4]

    h = c5
    route_idx0 = 5 if cfg.spp else 4  # lr86 in -spp, lr79 in plain
    for i, pp in enumerate(params["h0"]):
        h = _cbl_a(pp, h)
        if cfg.spp and i == 2:
            # yolov3-spp cat order {mp13, mp9, mp5, x} (yolov3-spp.cpp:310)
            h = jnp.concatenate([nn.max_pool(h, 13, 1, 6),
                                 nn.max_pool(h, 9, 1, 4),
                                 nn.max_pool(h, 5, 1, 2), h], -1)
        if i == route_idx0:
            route0 = h
    det0 = nn.conv2d(h, params["det0"]["w"], params["det0"]["b"])
    u = nn.upsample_nearest(_cbl_a(params["r_mid"], route0))
    h = jnp.concatenate([u, c4], -1)
    for i, pp in enumerate(params["h1"]):
        h = _cbl_a(pp, h)
        if i == 4:
            route1 = h
    det1 = nn.conv2d(h, params["det1"]["w"], params["det1"]["b"])
    u = nn.upsample_nearest(_cbl_a(params["r_small"], route1))
    h = jnp.concatenate([u, c3], -1)
    for pp in params["h2"]:
        h = _cbl_a(pp, h)
    det2 = nn.conv2d(h, params["det2"]["w"], params["det2"]["b"])

    nc = cfg.num_classes
    parts = [_decode_level(d, jnp.asarray(ANCHORS[i]), STRIDES[i], nc,
                           cfg.ignore_thresh)
             for i, d in enumerate([det0, det1, det2])]
    boxes = jnp.concatenate([p[0] for p in parts], 1)
    conf = jnp.concatenate([p[1] for p in parts], 1)
    cls_id = jnp.concatenate([p[2] for p in parts], 1)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="yolov3",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov3Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv3 / -spp anchor detector (reference: yolov3/, yolov3-spp/)",
))


# ---- yolov3-tiny (reference: yolov3-tiny/yolov3-tiny.cpp:222-290) ----------

# 2 levels: stride 32 then 16 (yololayer.h:26-35)
_TINY_ANCHORS = np.array([[[81, 82], [135, 169], [344, 319]],
                          [[23, 27], [37, 58], [81, 82]]], np.float32)
# (layer_idx, out_ch); every conv is 3x3 except 13/18 (1x1)
_TINY_BACKBONE = [(0, 16), (2, 32), (4, 64), (6, 128), (8, 256), (10, 512)]


def build_tiny_params(wm, cfg: Yolov3Cfg):
    no = 3 * (5 + cfg.num_classes)
    p = {"backbone": []}
    cin = 3
    for idx, co in _TINY_BACKBONE:
        p["backbone"].append(_cbl(wm, idx, co, cin, 3))
        cin = co
    p["c12"] = _cbl(wm, 12, 1024, 512, 3)
    p["c13"] = _cbl(wm, 13, 256, 1024, 1)
    p["c14"] = _cbl(wm, 14, 512, 256, 3)
    p["det0"] = _head_conv(wm, 15, no, 512)
    p["c18"] = _cbl(wm, 18, 128, 256, 1)
    p["c21"] = _cbl(wm, 21, 256, 384, 3)
    p["det1"] = _head_conv(wm, 22, no, 256)
    return p


def tiny_apply(params, x, cfg: Yolov3Cfg):
    y = x
    taps = {}
    for i, ((idx, co), pp) in enumerate(zip(_TINY_BACKBONE,
                                            params["backbone"])):
        y = _cbl_a(pp, y)
        taps[idx] = y
        if idx < 10:
            y = nn.max_pool(y, 2, 2)
        else:
            # pool11: pad bottom/right then 2x2 s1 max pool (keeps HxW)
            y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)),
                        constant_values=-jnp.inf)
            y = nn.max_pool(y, 2, 1)
    y = _cbl_a(params["c12"], y)
    l13 = _cbl_a(params["c13"], y)
    y = _cbl_a(params["c14"], l13)
    det0 = nn.conv2d(y, params["det0"]["w"], params["det0"]["b"])
    u = nn.upsample_nearest(_cbl_a(params["c18"], l13))  # ones-deconv ≡
    h = jnp.concatenate([u, taps[8]], -1)                # nearest ×2
    h = _cbl_a(params["c21"], h)
    det1 = nn.conv2d(h, params["det1"]["w"], params["det1"]["b"])

    nc = cfg.num_classes
    parts = [_decode_level(d, jnp.asarray(_TINY_ANCHORS[i]), (32, 16)[i],
                           nc, cfg.ignore_thresh)
             for i, d in enumerate([det0, det1])]
    boxes = jnp.concatenate([p[0] for p in parts], 1)
    conf = jnp.concatenate([p[1] for p in parts], 1)
    cls_id = jnp.concatenate([p[2] for p in parts], 1)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="yolov3-tiny",
    build_params=build_tiny_params,
    apply=tiny_apply,
    default_cfg=Yolov3Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="YOLOv3-tiny (reference: yolov3-tiny/yolov3-tiny.cpp)",
))
