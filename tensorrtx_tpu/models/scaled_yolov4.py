"""Scaled-YOLOv4 CSP (reference: scaled-yolov4/yolov4_csp.cpp — all-Mish
CSPDarknet backbone + CSP-ized SPP/PAN neck, v5-style power decode
((cell + 2σ − 0.5)·stride, wh=(2σ)²·anchor), module_list.N naming)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

BN_EPS = 1e-5

ANCHORS = np.array([[[12, 16], [19, 36], [40, 28]],
                    [[36, 75], [76, 55], [72, 146]],
                    [[142, 110], [192, 243], [459, 401]]], np.float32)
STRIDES = (8, 16, 32)

# csp stages: (down, ch, n, a, b, post, trans); res i convs at b+1+3i/b+2+3i
_STAGES = [
    (5, 128, 2, 6, 8, 15, 17),
    (18, 256, 8, 19, 21, 46, 48),
    (49, 512, 8, 50, 52, 77, 79),
    (80, 1024, 4, 81, 83, 96, 98),
]

# plain mish convs: idx -> (out, in, k) ; stride handled in apply
_NECK = [
    (99, 512, 1024, 1), (101, 512, 1024, 1), (102, 512, 512, 3),
    (103, 512, 512, 1), (110, 512, 2048, 1), (111, 512, 512, 3),
    (113, 512, 1024, 1), (114, 256, 512, 1), (117, 256, 512, 1),
    (119, 256, 512, 1), (120, 256, 256, 1), (122, 256, 256, 1),
    (123, 256, 256, 3), (124, 256, 256, 1), (125, 256, 256, 3),
    (127, 256, 512, 1), (128, 128, 256, 1), (131, 128, 256, 1),
    (133, 128, 256, 1), (134, 128, 128, 1), (136, 128, 128, 1),
    (137, 128, 128, 3), (138, 128, 128, 1), (139, 128, 128, 3),
    (141, 128, 256, 1), (142, 256, 128, 3), (146, 256, 128, 3),
    (148, 256, 512, 1), (149, 256, 256, 1), (151, 256, 256, 1),
    (152, 256, 256, 3), (153, 256, 256, 1), (154, 256, 256, 3),
    (156, 256, 512, 1), (157, 512, 256, 3), (161, 512, 256, 3),
    (163, 512, 1024, 1), (164, 512, 512, 1), (166, 512, 512, 1),
    (167, 512, 512, 3), (168, 512, 512, 1), (169, 512, 512, 3),
    (171, 512, 1024, 1), (172, 1024, 512, 3),
]


@dataclasses.dataclass
class ScaledYolov4Cfg:
    num_classes: int = 80
    input_h: int = 512
    input_w: int = 512
    conf_thresh: float = 0.5
    nms_thresh: float = 0.4
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"


def _cb(wm, idx, co, ci, k):
    return wm.conv_bn(f"module_list.{idx}.Conv2d",
                      f"module_list.{idx}.BatchNorm2d", co, ci, (k, k),
                      eps=BN_EPS)


def build_params(wm, cfg: ScaledYolov4Cfg):
    no = 3 * (5 + cfg.num_classes)
    p = {
        "c0": _cb(wm, 0, 32, 3, 3),
        "c1": _cb(wm, 1, 64, 32, 3),
        "c2": _cb(wm, 2, 32, 64, 1),
        "c3": _cb(wm, 3, 64, 32, 3),
        "stages": [],
    }
    cin = 64
    for (down, ch, n, a, bidx, post, trans) in _STAGES:
        half = ch // 2
        p["stages"].append({
            "down": _cb(wm, down, ch, cin, 3),
            "a": _cb(wm, a, half, ch, 1),
            "b": _cb(wm, bidx, half, ch, 1),
            "res": [(_cb(wm, bidx + 1 + 3 * i, half, half, 1),
                     _cb(wm, bidx + 2 + 3 * i, half, half, 3))
                    for i in range(n)],
            "post": _cb(wm, post, half, half, 1),
            "trans": _cb(wm, trans, ch, 2 * half, 1),
        })
        cin = ch
    p["neck"] = {str(i): _cb(wm, i, co, ci, k) for i, co, ci, k in _NECK}
    p["det"] = {str(i): wm.conv2d(f"module_list.{i}.Conv2d", no, ci, (1, 1))
                for i, ci in ((143, 256), (158, 512), (173, 1024))}
    return p


def _m(pp, x, stride=1):
    k = pp["w"].shape[0]
    return nn.mish(nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2))


def _csp_a(st, x):
    d = _m(st["down"], x, stride=2)
    a = _m(st["a"], d)
    y = _m(st["b"], d)
    for c1, c2 in st["res"]:
        y = y + _m(c2, _m(c1, y))
    y = _m(st["post"], y)
    return _m(st["trans"], jnp.concatenate([y, a], axis=-1))


def _decode_level(raw, anchors, stride, nc, ignore_thresh):
    return D.anchor_decode_level_flat(raw, anchors, stride, nc,
                                      ignore_thresh, power=True)


def apply(params, x, cfg: ScaledYolov4Cfg):
    y = _m(params["c0"], x)
    y = _m(params["c1"], y, stride=2)
    return _apply_from_c1(params, y, cfg)


def apply_s2d(params, x2, cfg: ScaledYolov4Cfg):
    """Fused-serving fast path from the 2×2 space-to-depth letterbox
    tensor (mish stem; see models/_yolo_blocks.stem_s1s2_s2d_a)."""
    import tensorrtx_tpu.models._yolo_blocks as B
    return _apply_from_c1(
        params,
        B.stem_s1s2_s2d_a(params["c0"], params["c1"], x2, act=nn.mish), cfg)


apply_s2d.factor = 2


def _apply_from_c1(params, y, cfg: ScaledYolov4Cfg):
    nk = params["neck"]
    y = y + _m(params["c3"], _m(params["c2"], y))
    stage_outs = []
    for st in params["stages"]:
        y = _csp_a(st, y)
        stage_outs.append(y)
    l48, l79, l98 = stage_outs[1], stage_outs[2], stage_outs[3]

    l99 = _m(nk["99"], l98)
    y = _m(nk["103"], _m(nk["102"], _m(nk["101"], l98)))
    spp = jnp.concatenate([nn.max_pool(y, 13, 1, 6), nn.max_pool(y, 9, 1, 4),
                           nn.max_pool(y, 5, 1, 2), y], -1)
    y = _m(nk["111"], _m(nk["110"], spp))
    l113 = _m(nk["113"], jnp.concatenate([y, l99], -1))
    u = nn.upsample_nearest(_m(nk["114"], l113))
    l117 = _m(nk["117"], l79)
    y = jnp.concatenate([l117, u], -1)
    l119 = _m(nk["119"], y)
    l120 = _m(nk["120"], l119)
    y = _m(nk["125"], _m(nk["124"], _m(nk["123"], _m(nk["122"], l119))))
    l127 = _m(nk["127"], jnp.concatenate([y, l120], -1))
    u = nn.upsample_nearest(_m(nk["128"], l127))
    l131 = _m(nk["131"], l48)
    y = jnp.concatenate([l131, u], -1)
    l133 = _m(nk["133"], y)
    l134 = _m(nk["134"], l133)
    y = _m(nk["139"], _m(nk["138"], _m(nk["137"], _m(nk["136"], l133))))
    l141 = _m(nk["141"], jnp.concatenate([y, l134], -1))
    d8 = nn.conv2d(_m(nk["142"], l141), params["det"]["143"]["w"],
                   params["det"]["143"]["b"])
    y = jnp.concatenate([_m(nk["146"], l141, stride=2), l127], -1)
    l148 = _m(nk["148"], y)
    l149 = _m(nk["149"], l148)
    y = _m(nk["154"], _m(nk["153"], _m(nk["152"], _m(nk["151"], l148))))
    l156 = _m(nk["156"], jnp.concatenate([y, l149], -1))
    d16 = nn.conv2d(_m(nk["157"], l156), params["det"]["158"]["w"],
                    params["det"]["158"]["b"])
    y = jnp.concatenate([_m(nk["161"], l156, stride=2), l113], -1)
    l163 = _m(nk["163"], y)
    l164 = _m(nk["164"], l163)
    y = _m(nk["169"], _m(nk["168"], _m(nk["167"], _m(nk["166"], l163))))
    l171 = _m(nk["171"], jnp.concatenate([y, l164], -1))
    d32 = nn.conv2d(_m(nk["172"], l171), params["det"]["173"]["w"],
                    params["det"]["173"]["b"])

    nc = cfg.num_classes
    parts = [_decode_level(d, jnp.asarray(ANCHORS[i]), STRIDES[i], nc,
                           cfg.ignore_thresh)
             for i, d in enumerate([d8, d16, d32])]
    boxes = jnp.concatenate([p[0] for p in parts], 1)
    conf = jnp.concatenate([p[1] for p in parts], 1)
    cls_id = jnp.concatenate([p[2] for p in parts], 1)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="scaled-yolov4",
    build_params=build_params,
    apply=apply,
    default_cfg=ScaledYolov4Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="Scaled-YOLOv4 CSP (reference: scaled-yolov4/)",
))
