"""YOLOv5-Lite-s (reference: yolov5-lite/v5lite.cpp — ShuffleNetV2 backbone
(conv_bn_relu_maxpool stem, shuffle_blocks identical to shufflenetv2's
InvertedResidual), depthwise neck (DWConvblocks + SiLU 1×1 convBlocks),
v5 anchor heads at model.21 with anchors from `model.21.anchor_grid`)."""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.shufflenetv2 import channel_shuffle
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms


def _ch(x, divisor=8.0):
    return int(math.ceil(x / divisor) * divisor)


@dataclasses.dataclass
class Yolov5LiteCfg:
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"


def _sb_p(wm, name, cin, cout, s):
    half = cout // 2
    p = {}
    if s > 1:
        p["b1_dw"] = wm.conv_bn(f"{name}branch1.0", f"{name}branch1.1",
                                cin, cin, (3, 3), groups=cin, eps=1e-5)
        p["b1_pw"] = wm.conv_bn(f"{name}branch1.2", f"{name}branch1.3",
                                half, cin, (1, 1), eps=1e-5)
        b2in = cin
    else:
        b2in = half
    p["b2_pw1"] = wm.conv_bn(f"{name}branch2.0", f"{name}branch2.1",
                             half, b2in, (1, 1), eps=1e-5)
    p["b2_dw"] = wm.conv_bn(f"{name}branch2.3", f"{name}branch2.4",
                            half, half, (3, 3), groups=half, eps=1e-5)
    p["b2_pw2"] = wm.conv_bn(f"{name}branch2.5", f"{name}branch2.6",
                             half, half, (1, 1), eps=1e-5)
    return p


def _dw_p(wm, name, cin, cout):
    return {
        "dw": wm.conv_bn(f"{name}.conv1", f"{name}.bn1", cin, cin, (3, 3),
                         groups=cin, eps=1e-5),
        "pw": wm.conv_bn(f"{name}.conv2", f"{name}.bn2", cout, cin, (1, 1),
                         eps=1e-5),
    }


def build_params(wm, cfg: Yolov5LiteCfg):
    c116, c232, c464, c96 = _ch(116), _ch(232), _ch(464), _ch(96)
    p = {
        "stem": wm.conv_bn("model.0.conv.0", "model.0.conv.1", 32, 3, (3, 3),
                           eps=1e-3),
        "m1": _sb_p(wm, "model.1.", 32, c116, 2),
        "m2": [_sb_p(wm, f"model.2.{i}.", c116, c116, 1) for i in range(3)],
        "m3": _sb_p(wm, "model.3.", c116, c232, 2),
        "m4": [_sb_p(wm, f"model.4.{i}.", c232, c232, 1) for i in range(7)],
        "m5": _sb_p(wm, "model.5.", c232, c464, 2),
        "m6": _sb_p(wm, "model.6.", c464, c464, 1),
        "m7": wm.conv_bn("model.7.conv", "model.7.bn", c96, c464, (1, 1), eps=1e-3),
        "m10": _dw_p(wm, "model.10", c96 + c232, c96),
        "m11": wm.conv_bn("model.11.conv", "model.11.bn", c96, c96, (1, 1), eps=1e-3),
        "m14": _dw_p(wm, "model.14", c96 + c116, c96),
        "m15": _dw_p(wm, "model.15", c96, c96),
        "m17": _dw_p(wm, "model.17", c96, c96),
        "m18": _dw_p(wm, "model.18", c96, c96),
        "m20": _dw_p(wm, "model.20", c96, c96),
        "anchors": wm.tensor("model.21.anchor_grid", (3, 3, 2)),
    }
    no = 3 * (5 + cfg.num_classes)
    p["det"] = [wm.conv2d(f"model.21.m.{i}", no, c96, (1, 1)) for i in range(3)]
    return p


def _sb_a(p, x, s):
    if s > 1:
        g = p["b1_dw"]["w"].shape[3]
        b1 = nn.conv2d(x, p["b1_dw"]["w"], p["b1_dw"]["b"], stride=2,
                       padding=1, groups=g)
        b1 = jax.nn.relu(nn.conv2d(b1, p["b1_pw"]["w"], p["b1_pw"]["b"]))
        b2in = x
    else:
        c = x.shape[-1] // 2
        b1, b2in = x[..., :c], x[..., c:]
    z = jax.nn.relu(nn.conv2d(b2in, p["b2_pw1"]["w"], p["b2_pw1"]["b"]))
    g = p["b2_dw"]["w"].shape[3]
    z = nn.conv2d(z, p["b2_dw"]["w"], p["b2_dw"]["b"], stride=s, padding=1,
                  groups=g)
    z = jax.nn.relu(nn.conv2d(z, p["b2_pw2"]["w"], p["b2_pw2"]["b"]))
    return channel_shuffle(jnp.concatenate([b1, z], axis=-1))


def _dw_a(p, x, s=1):
    g = p["dw"]["w"].shape[3]
    y = jax.nn.relu(nn.conv2d(x, p["dw"]["w"], p["dw"]["b"], stride=s,
                              padding=1, groups=g))
    return jax.nn.relu(nn.conv2d(y, p["pw"]["w"], p["pw"]["b"]))


def apply(params, x, cfg: Yolov5LiteCfg):
    y = jax.nn.relu(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"],
                              stride=2, padding=1))
    return _apply_from_stem(params, y, cfg)


def apply_s2d(params, x2, cfg: Yolov5LiteCfg):
    """Fused-serving fast path: the 3×3 s2 stem conv runs as a block conv
    on the 2×2 space-to-depth letterbox tensor (ops/nn.conv2d_s2d)."""
    y = jax.nn.relu(nn.conv2d_s2d(
        x2, nn.s2d_conv_weights(params["stem"]["w"]), params["stem"]["b"]))
    return _apply_from_stem(params, y, cfg)


apply_s2d.factor = 2


def _apply_from_stem(params, y, cfg: Yolov5LiteCfg):
    y = nn.max_pool(y, 3, 2, 1)
    y = _sb_a(params["m1"], y, 2)
    for bp in params["m2"]:
        y = _sb_a(bp, y, 1)
    c2 = y
    y = _sb_a(params["m3"], y, 2)
    for bp in params["m4"]:
        y = _sb_a(bp, y, 1)
    c4 = y
    y = _sb_a(params["m5"], y, 2)
    y = _sb_a(params["m6"], y, 1)
    p7 = nn.silu(nn.conv2d(y, params["m7"]["w"], params["m7"]["b"]))
    u = nn.upsample_nearest(p7)
    y = _dw_a(params["m10"], jnp.concatenate([u, c4], -1))
    p11 = nn.silu(nn.conv2d(y, params["m11"]["w"], params["m11"]["b"]))
    u = nn.upsample_nearest(p11)
    p14 = _dw_a(params["m14"], jnp.concatenate([u, c2], -1))
    y = _dw_a(params["m15"], p14, s=2) + p11
    p17 = _dw_a(params["m17"], y)
    y = _dw_a(params["m18"], p17, s=2) + p7
    p20 = _dw_a(params["m20"], y)

    nc = cfg.num_classes
    b = p20.shape[0]
    strides = (8, 16, 32)
    boxes_all, conf_all, cls_all = [], [], []
    for i, f in enumerate([p14, p17, p20]):
        raw = nn.conv2d(f, params["det"][i]["w"], params["det"][i]["b"])
        h, w_ = raw.shape[1], raw.shape[2]
        bx, conf, cls_id = D.anchor_decode_level_flat(
            raw, params["anchors"][i], strides[i], nc, cfg.ignore_thresh,
            power=True)
        boxes_all.append(bx)
        conf_all.append(conf)
        cls_all.append(cls_id)
    boxes = jnp.concatenate(boxes_all, 1)
    conf = jnp.concatenate(conf_all, 1)
    cls_id = jnp.concatenate(cls_all, 1)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="yolov5-lite",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov5LiteCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv5-Lite-s shuffle backbone detector (reference: yolov5-lite/)",
))
