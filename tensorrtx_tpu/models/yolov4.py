"""YOLOv4 (reference: yolov4/yolov4.cpp — CSPDarknet-53 backbone with Mish
(the mish.cu plugin → one jnp expression), leaky SPP+PANet neck, three v3-
style anchor heads at strides 8/16/32; module_list.N darknet naming).

The 160-layer unrolled builder becomes a table-driven CSP stage generator.
"""

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

# CSP stages: (down_idx, channels, n_res, mid)  — route/cat/transition indices
# are derived: A = down+1, B = down+3, res i convs at B+1+2i/B+2+2i (+ew),
# post = last+?  (matches yolov4.cpp:232-360 exactly via the offsets below)
_STAGES = [
    # (down_idx, ch, n, resmid, a_idx, b_idx, post_idx, trans_idx)
    (1, 64, 1, 32, 2, 4, 8, 10),
    (11, 128, 2, 64, 12, 14, 21, 23),
    (24, 256, 8, 128, 25, 27, 52, 54),
    (55, 512, 8, 256, 56, 58, 83, 85),
    (86, 1024, 4, 512, 87, 89, 102, 104),
]


@dataclasses.dataclass
class Yolov4Cfg:
    num_classes: int = 80
    input_h: int = 608
    input_w: int = 608
    conf_thresh: float = 0.5
    nms_thresh: float = 0.4
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"


def _cb(wm, idx, co, ci, k):
    return wm.conv_bn(f"module_list.{idx}.Conv2d",
                      f"module_list.{idx}.BatchNorm2d", co, ci, (k, k),
                      eps=BN_EPS)


def build_params(wm, cfg: Yolov4Cfg):
    no = 3 * (5 + cfg.num_classes)
    p = {"c0": _cb(wm, 0, 32, 3, 3), "stages": []}
    cin = 32
    for (down, ch, n, mid, a, bidx, post, trans) in _STAGES:
        half = ch if down == 1 else ch // 2
        st = {
            "down": _cb(wm, down, ch, cin, 3),
            "a": _cb(wm, a, half, ch, 1),
            "b": _cb(wm, bidx, half, ch, 1),
            "res": [(_cb(wm, bidx + 1 + 3 * i, mid, half, 1),
                     _cb(wm, bidx + 2 + 3 * i, half, mid, 3))
                    for i in range(n)],
            "post": _cb(wm, post, half, half, 1),
            "trans": _cb(wm, trans, ch, 2 * half, 1),
        }
        p["stages"].append(st)
        cin = ch
    # leaky neck (105-137) + heads
    leaky = [(105, 512, 1024, 1), (106, 1024, 512, 3), (107, 512, 1024, 1),
             (114, 512, 2048, 1), (115, 1024, 512, 3), (116, 512, 1024, 1),
             (117, 256, 512, 1), (120, 256, 512, 1), (122, 256, 512, 1),
             (123, 512, 256, 3), (124, 256, 512, 1), (125, 512, 256, 3),
             (126, 256, 512, 1), (127, 128, 256, 1), (130, 128, 256, 1),
             (132, 128, 256, 1), (133, 256, 128, 3), (134, 128, 256, 1),
             (135, 256, 128, 3), (136, 128, 256, 1), (137, 256, 128, 3),
             (141, 256, 128, 3), (143, 256, 512, 1), (144, 512, 256, 3),
             (145, 256, 512, 1), (146, 512, 256, 3), (147, 256, 512, 1),
             (148, 512, 256, 3), (152, 512, 256, 3), (154, 512, 1024, 1),
             (155, 1024, 512, 3), (156, 512, 1024, 1), (157, 1024, 512, 3),
             (158, 512, 1024, 1), (159, 1024, 512, 3)]
    p["leaky"] = {str(i): _cb(wm, i, co, ci, k) for i, co, ci, k in leaky}
    p["det"] = {str(i): wm.conv2d(f"module_list.{i}.Conv2d", no, ci, (1, 1))
                for i, ci in ((138, 256), (149, 512), (160, 1024))}
    return p


def _mish_a(pp, x, stride=1):
    k = pp["w"].shape[0]
    return nn.mish(nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2))


def _leaky_a(pp, x, stride=1):
    k = pp["w"].shape[0]
    return nn.leaky_relu(
        nn.conv2d(x, pp["w"], pp["b"], stride=stride, padding=k // 2), 0.1)


def _csp_a(st, x):
    return _csp_tail_a(st, _mish_a(st["down"], x, stride=2))


def _csp_tail_a(st, d):
    a = _mish_a(st["a"], d)
    b = _mish_a(st["b"], d)
    y = b
    for c1, c2 in st["res"]:
        y = y + _mish_a(c2, _mish_a(c1, y))
    y = _mish_a(st["post"], y)
    cat = jnp.concatenate([y, a], axis=-1)
    return _mish_a(st["trans"], cat)


def _decode_level(raw, anchors, stride, nc, ignore_thresh):
    return D.anchor_decode_level_flat(raw, anchors, stride, nc,
                                      ignore_thresh, power=False)


def apply(params, x, cfg: Yolov4Cfg):
    y = _mish_a(params["c0"], x)
    d0 = _mish_a(params["stages"][0]["down"], y, stride=2)
    return _apply_from_down0(params, d0, cfg)


def apply_s2d(params, x2, cfg: Yolov4Cfg):
    """Fused-serving fast path from the 2×2 space-to-depth letterbox
    tensor (mish stem; see models/_yolo_blocks.stem_s1s2_s2d_a)."""
    import tensorrtx_tpu.models._yolo_blocks as B
    d0 = B.stem_s1s2_s2d_a(params["c0"], params["stages"][0]["down"], x2,
                           act=nn.mish)
    return _apply_from_down0(params, d0, cfg)


apply_s2d.factor = 2


def _apply_from_down0(params, d0, cfg: Yolov4Cfg):
    lk = params["leaky"]
    y = _csp_tail_a(params["stages"][0], d0)
    outs = [y]
    for st in params["stages"][1:]:
        y = _csp_a(st, y)
        outs.append(y)
    l54, l85, l104 = outs[2], outs[3], outs[4]

    y = _leaky_a(lk["107"], _leaky_a(lk["106"], _leaky_a(lk["105"], l104)))
    spp = jnp.concatenate([nn.max_pool(y, 13, 1, 6), nn.max_pool(y, 9, 1, 4),
                           nn.max_pool(y, 5, 1, 2), y], -1)
    y = _leaky_a(lk["116"], _leaky_a(lk["115"], _leaky_a(lk["114"], spp)))
    l116 = y
    u = nn.upsample_nearest(_leaky_a(lk["117"], y))
    l120 = _leaky_a(lk["120"], l85)
    y = jnp.concatenate([l120, u], -1)
    for i in ("122", "123", "124", "125", "126"):
        y = _leaky_a(lk[i], y)
    l126 = y
    u = nn.upsample_nearest(_leaky_a(lk["127"], y))
    l130 = _leaky_a(lk["130"], l54)
    y = jnp.concatenate([l130, u], -1)
    for i in ("132", "133", "134", "135", "136"):
        y = _leaky_a(lk[i], y)
    l136 = y
    d8 = nn.conv2d(_leaky_a(lk["137"], y), params["det"]["138"]["w"],
                   params["det"]["138"]["b"])
    y = jnp.concatenate([_leaky_a(lk["141"], l136, stride=2), l126], -1)
    for i in ("143", "144", "145", "146", "147"):
        y = _leaky_a(lk[i], y)
    l147 = y
    d16 = nn.conv2d(_leaky_a(lk["148"], y), params["det"]["149"]["w"],
                    params["det"]["149"]["b"])
    y = jnp.concatenate([_leaky_a(lk["152"], l147, stride=2), l116], -1)
    for i in ("154", "155", "156", "157", "158"):
        y = _leaky_a(lk[i], y)
    d32 = nn.conv2d(_leaky_a(lk["159"], y), params["det"]["160"]["w"],
                    params["det"]["160"]["b"])

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
    name="yolov4",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov4Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv4 CSPDarknet-53 + PANet (reference: yolov4/)",
))
