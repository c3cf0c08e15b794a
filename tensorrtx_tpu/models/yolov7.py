"""YOLOv7 (base) — E-ELAN backbone + SPPCSPC + ELAN-H PAN + RepConv heads.

Reference: yolov7/src/model.cpp:1567-1775 (build_engine_yolov7),
yolov7/src/block.cpp (convBnSilu :85 with BN eps 1e-3, SPPCSPC :132,
RepConv :168, getAnchors :208 reading `model.105.anchor_grid`),
yolov7/plugin/yololayer.cu (v5-family power decode:
xy = (2σ−0.5+cell)·stride, wh = (2σ)²·anchor, conf = σ(obj)·σ(cls)).

Graph shapes, ELAN concat orders and layer indices follow the reference
exactly; layers that TRT expresses as plugin/shuffle boilerplate
(yololayer, anchor grids) are dense XLA ops here.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms


@dataclasses.dataclass
class Yolov7Cfg:
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    ignore_thresh: float = 0.1
    max_det: int = 300
    postprocess: str = "nms"


def _cv(wm, idx, ci, co, k):
    return B.conv_p(wm, f"model.{idx}", ci, co, k)


def _elan_p(wm, a, ci, branch, chain, n=4):
    """ELAN: two 1x1 branches at model.{a}/{a+1}, 3x3 chain at
    model.{a+2}..{a+1+n}, 1x1 fuse at model.{a+2+n} (after the concat slot)."""
    p = {"a": _cv(wm, a, ci, branch, 1), "b": _cv(wm, a + 1, ci, branch, 1),
         "chain": []}
    cin = branch
    for i in range(n):
        p["chain"].append(_cv(wm, a + 2 + i, cin, chain, 3))
        cin = chain
    return p


def _mp_p(wm, idx, ci, co):
    """MaxPool transition: mp2x2 → 1x1 at model.{idx+1}; 1x1 at model.{idx+2}
    + 3x3 s2 at model.{idx+3} on the unpooled input."""
    return {"c1": _cv(wm, idx + 1, ci, co, 1),
            "c2": _cv(wm, idx + 2, ci, co, 1),
            "c3": _cv(wm, idx + 3, co, co, 3)}


def _sppcspc_p(wm, idx, ci, co):
    n = f"model.{idx}"
    c_ = co
    return {"cv1": B.conv_p(wm, f"{n}.cv1", ci, c_, 1),
            "cv2": B.conv_p(wm, f"{n}.cv2", ci, c_, 1),
            "cv3": B.conv_p(wm, f"{n}.cv3", c_, c_, 3),
            "cv4": B.conv_p(wm, f"{n}.cv4", c_, c_, 1),
            "cv5": B.conv_p(wm, f"{n}.cv5", 4 * c_, c_, 1),
            "cv6": B.conv_p(wm, f"{n}.cv6", c_, c_, 3),
            "cv7": B.conv_p(wm, f"{n}.cv7", 2 * c_, co, 1)}


def _repconv_p(wm, idx, ci, co):
    n = f"model.{idx}"
    return {"dense": wm.conv_bn(f"{n}.rbr_dense.0", f"{n}.rbr_dense.1",
                                co, ci, (3, 3), eps=1e-3),
            "one": wm.conv_bn(f"{n}.rbr_1x1.0", f"{n}.rbr_1x1.1",
                              co, ci, (1, 1), eps=1e-3)}


def build_params(wm, cfg: Yolov7Cfg):
    p = {
        "c0": _cv(wm, 0, 3, 32, 3), "c1": _cv(wm, 1, 32, 64, 3),
        "c2": _cv(wm, 2, 64, 64, 3), "c3": _cv(wm, 3, 64, 128, 3),
        "e4": _elan_p(wm, 4, 128, 64, 64), "f11": _cv(wm, 11, 256, 256, 1),
        "mp12": _mp_p(wm, 12, 256, 128),
        "e17": _elan_p(wm, 17, 256, 128, 128), "f24": _cv(wm, 24, 512, 512, 1),
        "mp25": _mp_p(wm, 25, 512, 256),
        "e30": _elan_p(wm, 30, 512, 256, 256),
        "f37": _cv(wm, 37, 1024, 1024, 1),
        "mp38": _mp_p(wm, 38, 1024, 512),
        "e43": _elan_p(wm, 43, 1024, 256, 256),
        "f50": _cv(wm, 50, 1024, 1024, 1),
        "spp51": _sppcspc_p(wm, 51, 1024, 512),
        "c52": _cv(wm, 52, 512, 256, 1), "c54": _cv(wm, 54, 1024, 256, 1),
        "e56": _elan_p(wm, 56, 512, 256, 128), "f63": _cv(wm, 63, 1024, 256, 1),
        "c64": _cv(wm, 64, 256, 128, 1), "c66": _cv(wm, 66, 512, 128, 1),
        "e68": _elan_p(wm, 68, 256, 128, 64), "f75": _cv(wm, 75, 512, 128, 1),
        "mp76": _mp_p(wm, 76, 128, 128),
        "e81": _elan_p(wm, 81, 512, 256, 128), "f88": _cv(wm, 88, 1024, 256, 1),
        "mp89": _mp_p(wm, 89, 256, 256),
        "e94": _elan_p(wm, 94, 1024, 512, 256),
        "f101": _cv(wm, 101, 2048, 512, 1),
        "rep102": _repconv_p(wm, 102, 128, 256),
        "rep103": _repconv_p(wm, 103, 256, 512),
        "rep104": _repconv_p(wm, 104, 512, 1024),
    }
    no = 3 * (5 + cfg.num_classes)
    for i, ci in enumerate((256, 512, 1024)):
        p[f"det{i}"] = wm.conv2d(f"model.105.m.{i}", no, ci, (1, 1))
    p["anchors"] = wm.tensor("model.105.anchor_grid", (3, 3, 2))
    return p


def _elan_a(ep, x, full_concat):
    """full_concat=False → backbone 4-way [c3, c1, b, a];
    True → head 6-way [c3, c2, c1, c0, b, a] (model.cpp:1586, :1662)."""
    a = B.conv_a(ep["a"], x)
    b = B.conv_a(ep["b"], x)
    y = b
    outs = []
    for cp in ep["chain"]:
        y = B.conv_a(cp, y)
        outs.append(y)
    if full_concat:
        feats = [outs[3], outs[2], outs[1], outs[0], b, a]
    else:
        feats = [outs[3], outs[1], b, a]
    return jnp.concatenate(feats, axis=-1)


def _elan_mp_s2dh_a(ep, f11p, mpp, x):
    """Backbone ELAN + 1×1 transition + MP downsample evaluated in
    row-phase space (B, H/2, W, 2C) — the P2-grid 64-ch convs fill only
    half the MXU lanes planar (see _yolo_blocks.c3_down_a rationale).
    The 4-way concat is whole-segment (in_segments on the transition
    conv); the MP block exits phase space for free (maxpool2_s2dh +
    s2dh_exit stride-2 conv). Numerically identical to
    conv_a(f11, _elan_a(ep, x, False)) → _mp_a(mpp, ·) modulo dot
    order; quant-context order matches the planar path."""
    xh = nn.space_to_depth_h(x)
    a = B.conv_s2dh_a(ep["a"], xh)
    b = B.conv_s2dh_a(ep["b"], xh)
    y = b
    outs = []
    for cp in ep["chain"]:
        y = B.conv_s2dh_a(cp, y)
        outs.append(y)
    c = ep["a"]["w"].shape[-1]
    cat = jnp.concatenate([outs[3], outs[1], b, a], axis=-1)
    fh = B.conv_s2dh_a(f11p, cat, in_segments=(c,) * 4)
    y1 = B.conv_a(mpp["c1"], nn.maxpool2_s2dh(fh))
    y2h = B.conv_s2dh_a(mpp["c2"], fh)
    y2 = nn.silu(nn.conv2d_s2dh_exit(
        y2h, nn.s2dh_exit_conv_weights(mpp["c3"]["w"]), mpp["c3"]["b"]))
    return jnp.concatenate([y2, y1], axis=-1)


def _mp_a(mp, x, extra=None):
    y1 = B.conv_a(mp["c1"], nn.max_pool(x, 2, 2))
    y2 = B.conv_a(mp["c3"], B.conv_a(mp["c2"], x), stride=2)
    feats = [y2, y1] if extra is None else [y2, y1, extra]
    return jnp.concatenate(feats, axis=-1)


def _sppcspc_a(sp, x):
    x1 = B.conv_a(sp["cv4"], B.conv_a(sp["cv3"], B.conv_a(sp["cv1"], x)))
    cat = jnp.concatenate([x1, nn.max_pool(x1, 5, 1, 2),
                           nn.max_pool(x1, 9, 1, 4),
                           nn.max_pool(x1, 13, 1, 6)], -1)
    y = B.conv_a(sp["cv6"], B.conv_a(sp["cv5"], cat))
    return B.conv_a(sp["cv7"],
                    jnp.concatenate([y, B.conv_a(sp["cv2"], x)], -1))


def _rep_a(rp, x):
    y = (nn.conv2d(x, rp["dense"]["w"], rp["dense"]["b"], padding=1)
         + nn.conv2d(x, rp["one"]["w"], rp["one"]["b"]))
    return nn.silu(y)


def apply(params, x, cfg: Yolov7Cfg):
    y = B.conv_a(params["c0"], x)
    y = B.conv_a(params["c1"], y, stride=2)
    return _apply_from_c1(params, y, cfg)


def apply_s2d(params, x2, cfg: Yolov7Cfg):
    """Fused-serving fast path from the 2×2 space-to-depth letterbox
    tensor: the full-res 3×3 s1 + 3×3 s2 stem runs as block convs in
    parity space (models/_yolo_blocks.stem_s1s2_s2d_a)."""
    return _apply_from_c1(
        params, B.stem_s1s2_s2d_a(params["c0"], params["c1"], x2), cfg)


apply_s2d.factor = 2


def _apply_from_c1(params, y, cfg: Yolov7Cfg):
    y = B.conv_a(params["c2"], y)
    y = B.conv_a(params["c3"], y, stride=2)
    if y.shape[0] <= 8 and y.shape[1] % 2 == 0 and y.shape[2] % 2 == 0:
        # P2 ELAN + transition + MP in row-phase space (batch-gated like
        # the other row-phase motifs: at b32 the relayouts eat the win)
        y = _elan_mp_s2dh_a(params["e4"], params["f11"], params["mp12"], y)
    else:
        y = B.conv_a(params["f11"], _elan_a(params["e4"], y, False))
        y = _mp_a(params["mp12"], y)
    y = B.conv_a(params["f24"], _elan_a(params["e17"], y, False))
    c24 = y                                             # P3 lateral (1/8)
    y = B.conv_a(params["f37"], _elan_a(params["e30"],
                                        _mp_a(params["mp25"], y), False))
    c37 = y                                             # P4 lateral (1/16)
    y = B.conv_a(params["f50"], _elan_a(params["e43"],
                                        _mp_a(params["mp38"], y), False))
    c51 = _sppcspc_a(params["spp51"], y)                # P5 (1/32)

    u = nn.upsample_nearest(B.conv_a(params["c52"], c51))
    y = jnp.concatenate([B.conv_a(params["c54"], c37), u], -1)
    c63 = B.conv_a(params["f63"], _elan_a(params["e56"], y, True))
    u = nn.upsample_nearest(B.conv_a(params["c64"], c63))
    y = jnp.concatenate([B.conv_a(params["c66"], c24), u], -1)
    c75 = B.conv_a(params["f75"], _elan_a(params["e68"], y, True))
    y = _mp_a(params["mp76"], c75, extra=c63)
    c88 = B.conv_a(params["f88"], _elan_a(params["e81"], y, True))
    y = _mp_a(params["mp89"], c88, extra=c51)
    c101 = B.conv_a(params["f101"], _elan_a(params["e94"], y, True))

    p3 = _rep_a(params["rep102"], c75)
    p4 = _rep_a(params["rep103"], c88)
    p5 = _rep_a(params["rep104"], c101)

    nc = cfg.num_classes
    b = p3.shape[0]
    strides = (8, 16, 32)
    boxes_all, conf_all, cls_all = [], [], []
    for i, f in enumerate([p3, p4, p5]):
        raw = nn.conv2d(f, params[f"det{i}"]["w"], params[f"det{i}"]["b"])
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
    name="yolov7",
    build_params=build_params,
    apply=apply,
    default_cfg=Yolov7Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    apply_s2d=apply_s2d,
    doc="YOLOv7 base, ELAN + SPPCSPC + RepConv (reference: yolov7/)",
))
