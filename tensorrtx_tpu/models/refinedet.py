"""RefineDet-320 (VOC, 25 classes) — VGG16 + ARM/TCB/ODM two-step refinement.

Reference: refinedet/refinedet.cpp:375-540 (createEngine: torch `vgg.N`
naming, conv4_3/conv5_3 L2Norm with learned per-channel scale, dilated fc6
(k3 p3 d3, vgg.31) + fc7 (vgg.33), extras, ARM heads (3 anchors: loc 12ch,
binary conf 6ch), TCB top-down with ConvTranspose2d 2x (tcb0/tcb1/tcb2
index naming), ODM heads; reshapeSoftmax groups), :556-612 (SSD priors:
grids 40/20/10/5, steps 8/16/32/64, min_sizes 32/64/128/256, ratios
{1, √2, 1/√2}, clamp [0,1]) and :736-790 (host two-step decode with
variance (0.1, 0.2): refined = decode(arm_loc, priors), boxes =
decode(odm_loc, refined) corners; ODM conf masked by ARM objectness
> 0.01; per-class NMS 0.45).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

# VGG16 conv indices (torch features numbering) and channels
_VGG = [(0, 64), (2, 64), ("P", 0), (5, 128), (7, 128), ("P", 0),
        (10, 256), (12, 256), (14, 256), ("P", 0),
        (17, 512), (19, 512), (21, 512), ("P", 0),
        (24, 512), (26, 512), (28, 512)]


@dataclasses.dataclass
class RefinedetCfg:
    num_classes: int = 25
    input_h: int = 320
    input_w: int = 320
    obj_thresh: float = 0.01
    conf_thresh: float = 0.01
    nms_thresh: float = 0.45
    top_k: int = 1000
    postprocess: str = "raw"


def _conv(wm, name, co, ci, k):
    w = wm.tensor(f"{name}.weight", (co, ci, k, k))
    return {"w": np.transpose(w, (2, 3, 1, 0)), "b": wm.vec(f"{name}.bias", co)}


def build_params(wm, cfg: RefinedetCfg):
    p = {"vgg": {}}
    cin = 3
    for item in _VGG:
        if item[0] == "P":
            continue
        idx, co = item
        p["vgg"][str(idx)] = _conv(wm, f"vgg.{idx}", co, cin, 3)
        cin = co
    p["vgg"]["31"] = _conv(wm, "vgg.31", 1024, 512, 3)   # fc6, dilation 3
    p["vgg"]["33"] = _conv(wm, "vgg.33", 1024, 1024, 1)  # fc7
    p["l2n4"] = wm.vec("conv4_3_L2Norm.weight", 512)
    p["l2n5"] = wm.vec("conv5_3_L2Norm.weight", 512)
    p["ex0"] = _conv(wm, "extras.0", 256, 1024, 1)
    p["ex1"] = _conv(wm, "extras.1", 512, 256, 3)
    for i, ci in enumerate((512, 512, 1024, 512)):
        p[f"arm_loc{i}"] = _conv(wm, f"arm_loc.{i}", 12, ci, 3)
        p[f"arm_conf{i}"] = _conv(wm, f"arm_conf.{i}", 6, ci, 3)
    # TCB: tcb0 pairs (conv, conv) per level, tcb1 deconvs, tcb2 (conv)
    tcb0_idx = [(0, 2, 512), (3, 5, 512), (6, 8, 1024), (9, 11, 512)]
    for lv, (i0, i1, ci) in enumerate(tcb0_idx):
        p[f"tcb0_{lv}a"] = _conv(wm, f"tcb0.{i0}", 256, ci, 3)
        p[f"tcb0_{lv}b"] = _conv(wm, f"tcb0.{i1}", 256, 256, 3)
    for lv, i in enumerate((1, 4, 7, 10)):
        p[f"tcb2_{lv}"] = _conv(wm, f"tcb2.{i}", 256, 256, 3)
    for lv in range(3):
        up = wm.tensor(f"tcb1.{lv}.weight", (256, 256, 2, 2))
        p[f"tcb1_{lv}"] = {"w": np.transpose(up, (2, 3, 1, 0)),
                           "b": wm.vec(f"tcb1.{lv}.bias", 256)}
    nc = cfg.num_classes
    for i in range(4):
        p[f"odm_loc{i}"] = _conv(wm, f"odm_loc.{i}", 12, 256, 3)
        p[f"odm_conf{i}"] = _conv(wm, f"odm_conf.{i}", 3 * nc, 256, 3)
    return p


def _cr(pp, x, stride=1, dilation=1):
    k = pp["w"].shape[0]
    pad = dilation * (k - 1) // 2 if k > 1 else 0
    return jax.nn.relu(nn.conv2d(x, pp["w"], pp["b"], stride=stride,
                                 padding=pad, dilation=dilation))


def _l2norm(x, scale):
    n = jax.lax.rsqrt(jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-10)
    return x * n * scale.astype(x.dtype)


def _head(pp, x):
    y = nn.conv2d(x, pp["w"], pp["b"], padding=1)
    return y.reshape(y.shape[0], -1, y.shape[-1])  # (B, HW, C) then reflow


def _flat(levels, last):
    """conv_permutation + cat: level-major (B, Σ HW·anchors, last)."""
    outs = [lv.reshape(lv.shape[0], -1, last) for lv in levels]
    return jnp.concatenate(outs, 1)


def apply(params, x, cfg: RefinedetCfg):
    v = params["vgg"]
    y = _cr(v["0"], x)
    y = _cr(v["2"], y)
    y = nn.max_pool(y, 2, 2)
    y = _cr(v["5"], y)
    y = _cr(v["7"], y)
    y = nn.max_pool(y, 2, 2)
    y = _cr(v["10"], y)
    y = _cr(v["12"], y)
    y = _cr(v["14"], y)
    y = nn.max_pool(y, 2, 2)
    y = _cr(v["17"], y)
    y = _cr(v["19"], y)
    c43 = _cr(v["21"], y)
    y = nn.max_pool(c43, 2, 2)
    y = _cr(v["24"], y)
    y = _cr(v["26"], y)
    c53 = _cr(v["28"], y)
    y = nn.max_pool(c53, 2, 2)
    y = _cr(v["31"], y, dilation=3)
    fc7 = _cr(v["33"], y)
    ex = _cr(params["ex1"], _cr(params["ex0"], fc7), stride=2)
    f43 = _l2norm(c43, params["l2n4"])
    f53 = _l2norm(c53, params["l2n5"])

    srcs = [f43, f53, fc7, ex]
    arm_loc = _flat([nn.conv2d(s, params[f"arm_loc{i}"]["w"],
                               params[f"arm_loc{i}"]["b"], padding=1)
                     for i, s in enumerate(srcs)], 4)
    arm_conf = _flat([nn.conv2d(s, params[f"arm_conf{i}"]["w"],
                                params[f"arm_conf{i}"]["b"], padding=1)
                      for i, s in enumerate(srcs)], 2)

    # TCB top-down (levels indexed coarse→fine in tcb0 naming order 3..0)
    def tcb0(lv, s):
        h = _cr(params[f"tcb0_{lv}a"], s)
        return nn.conv2d(h, params[f"tcb0_{lv}b"]["w"],
                         params[f"tcb0_{lv}b"]["b"], padding=1)

    def tcb2(lv, s):
        return _cr(params[f"tcb2_{lv}"], jax.nn.relu(s))

    t3 = tcb2(3, tcb0(3, ex))
    up = nn.conv_transpose2d(t3, params["tcb1_2"]["w"],
                             params["tcb1_2"]["b"], stride=2)
    t2 = tcb2(2, tcb0(2, fc7) + up)
    up = nn.conv_transpose2d(t2, params["tcb1_1"]["w"],
                             params["tcb1_1"]["b"], stride=2)
    t1 = tcb2(1, tcb0(1, f53) + up)
    up = nn.conv_transpose2d(t1, params["tcb1_0"]["w"],
                             params["tcb1_0"]["b"], stride=2)
    t0 = tcb2(0, tcb0(0, f43) + up)

    odms = [t0, t1, t2, t3]
    odm_loc = _flat([nn.conv2d(s, params[f"odm_loc{i}"]["w"],
                               params[f"odm_loc{i}"]["b"], padding=1)
                     for i, s in enumerate(odms)], 4)
    odm_conf = _flat([nn.conv2d(s, params[f"odm_conf{i}"]["w"],
                                params[f"odm_conf{i}"]["b"], padding=1)
                      for i, s in enumerate(odms)], cfg.num_classes)
    return {"arm_loc": arm_loc.astype(jnp.float32),
            "arm_conf": jax.nn.softmax(arm_conf.astype(jnp.float32), -1),
            "odm_loc": odm_loc.astype(jnp.float32),
            "odm_conf": jax.nn.softmax(odm_conf.astype(jnp.float32), -1)}


def priors(cfg: RefinedetCfg) -> np.ndarray:
    """(6375, 4) cx cy w h in [0,1] (refinedet.cpp:556-596)."""
    out = []
    img = cfg.input_h
    for fm, step, ms in zip((40, 20, 10, 5), (8, 16, 32, 64),
                            (32, 64, 128, 256)):
        fk = img / step
        sk = ms / img
        for i in range(fm):
            for j in range(fm):
                cx, cy = (j + 0.5) / fk, (i + 0.5) / fk
                r = np.sqrt(2.0)
                out += [[cx, cy, sk, sk], [cx, cy, sk * r, sk / r],
                        [cx, cy, sk / r, sk * r]]
    return np.clip(np.asarray(out, np.float32), 0, 1)


def _ssd_decode(loc, prior):
    v0, v1 = 0.1, 0.2
    cxy = prior[:, :2] + loc[:, :2] * v0 * prior[:, 2:]
    # clip keeps float32 finite through the double decode (the reference
    # runs float64 on host; values past e^20 are garbage either way)
    wh = prior[:, 2:] * np.exp(np.minimum(loc[:, 2:] * v1, 20.0))
    return np.concatenate([cxy, wh], 1)


def postprocess(outputs, cfg: RefinedetCfg):
    """Two-step decode + ARM objectness gate + per-class greedy NMS.
    Returns per image: list of (box_xyxy_norm, score, cls)."""
    arm_loc = np.asarray(outputs["arm_loc"])
    arm_conf = np.asarray(outputs["arm_conf"])
    odm_loc = np.asarray(outputs["odm_loc"])
    odm_conf = np.asarray(outputs["odm_conf"])
    pri = priors(cfg)
    results = []
    for b in range(arm_loc.shape[0]):
        refined = _ssd_decode(arm_loc[b], pri)
        boxes_cwh = _ssd_decode(odm_loc[b], refined)
        x1y1 = boxes_cwh[:, :2] - boxes_cwh[:, 2:] / 2
        boxes = np.concatenate([x1y1, x1y1 + boxes_cwh[:, 2:]], 1)
        conf = odm_conf[b] * (arm_conf[b, :, 1:2] > cfg.obj_thresh)
        dets = []
        for c in range(1, cfg.num_classes):
            m = conf[:, c] > cfg.conf_thresh
            if not m.any():
                continue
            bx, sc = boxes[m], conf[m, c]
            order = np.argsort(-sc)[:cfg.top_k]
            keep = []
            for i in order:
                ok = True
                for j in keep:
                    xx1 = np.maximum(bx[i, :2], bx[j, :2])
                    xx2 = np.minimum(bx[i, 2:], bx[j, 2:])
                    inter = np.prod(np.clip(xx2 - xx1, 0, None))
                    a1 = np.prod(bx[i, 2:] - bx[i, :2])
                    a2 = np.prod(bx[j, 2:] - bx[j, :2])
                    if inter / max(a1 + a2 - inter, 1e-9) > cfg.nms_thresh:
                        ok = False
                        break
                if ok:
                    keep.append(i)
            dets += [(bx[i], float(sc[i]), c) for i in keep]
        results.append(sorted(dets, key=lambda d: -d[1]))
    return results


register(ModelDef(
    name="refinedet",
    build_params=build_params,
    apply=apply,
    default_cfg=RefinedetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="RefineDet-320 two-step detector (reference: refinedet/)",
))
