"""YOLOv13 det — depthwise-separable C3K2 backbone, A2C2f area attention,
HyperACE hypergraph correlation enhancement + FullPad tunnels.

Reference: yolov13/src/model.cpp:36-300 (buildEngineYolov13Det) and
yolov13/src/block.cpp (Conv :184 eps 1e-3, DSConv :491, DSBottleneck :521
(k1=3,k2=5), DSC3k :536, DSC3K2 :555 (k2=7), AAttn :303 — split qk/v convs,
dw5x5 pe on v, head_dim 32, A2C2f :443 (n modules × 2 ABlocks, optional
gamma residual), AdaHyperedgeGen :607 (context mean+max → prototype offsets,
per-head node·prototype logits / √hd, mean over heads, softmax over NODES),
AdaHGConv :746 (A^T·X → edge_proj GELU → A·He → node_proj GELU + residual),
C3AH :814, HyperACE :831, DownsampleConv :874, FullPad_Tunnel :889
(x0 + gate·x1 with a learned scalar gate)).

Scales (yolov13_det.cpp:150-180): n .5/.25, s .5/.5, l 1/1, x 1/1.5;
n scales num_hyperedges ×0.5 (=4), x ×1.5 (=12); l/x use dsc3k=true,
mlp_ratio 1.5, gamma residual, channel_adjust=false.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.models.yolo11 import _det_head_a, _det_head_p, _flatten_levels
from tensorrtx_tpu.ops import detect as D
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import select_and_nms

SCALES = {"n": (0.50, 0.25, 1024), "s": (0.50, 0.50, 1024),
          "l": (1.00, 1.00, 512), "x": (1.00, 1.50, 512)}


@dataclasses.dataclass
class Yolov13Cfg:
    scale: str = "n"
    num_classes: int = 80
    input_h: int = 640
    input_w: int = 640
    reg_max: int = 16
    conf_thresh: float = 0.5
    nms_thresh: float = 0.45
    max_det: int = 300
    postprocess: str = "nms"

    @property
    def multipliers(self):
        return SCALES[self.scale]

    @property
    def big(self):  # l/x variants flip several block flags
        return self.scale in ("l", "x")


def _chans(cfg):
    gd, gw, maxc = cfg.multipliers
    return (lambda x: B.get_width(x, gw, maxc)), (lambda x: B.get_depth(x, gd))


def _hyperedges(cfg):
    return {"n": 4, "s": 8, "l": 8, "x": 12}[cfg.scale]


# --- depthwise-separable blocks --------------------------------------------

def _dsconv_p(wm, name, ci, co, k):
    dw = wm.tensor(f"{name}.dw.weight", (ci, 1, k, k))
    pw = wm.tensor(f"{name}.pw.weight", (co, ci, 1, 1))
    s, b = wm.bn(f"{name}.bn", co, 1e-3)
    return {"dw": np.transpose(dw, (2, 3, 1, 0)),
            "pw": np.transpose(pw, (2, 3, 1, 0)) * s[None, None, None, :],
            "b": b}


def _dsconv_a(p, x, stride=1, dilation=1):
    k = p["dw"].shape[0]
    pad = dilation * (k - 1) // 2
    y = nn.conv2d(x, p["dw"], None, stride=stride, padding=pad,
                  groups=x.shape[-1], dilation=dilation)
    y = nn.conv2d(y, p["pw"], p["b"])
    return nn.silu(y)


def _dsbottleneck_p(wm, name, ci, co, e=0.5, k1=3, k2=5):
    c_ = int(co * e)
    return {"cv1": _dsconv_p(wm, f"{name}.cv1", ci, c_, k1),
            "cv2": _dsconv_p(wm, f"{name}.cv2", c_, co, k2)}


def _dsbottleneck_a(p, x, shortcut=True, d2=1):
    y = _dsconv_a(p["cv1"], x)
    y = _dsconv_a(p["cv2"], y, dilation=d2)
    return x + y if (shortcut and x.shape[-1] == y.shape[-1]) else y


def _dsc3k_p(wm, name, ci, co, n=2, e=0.5, k1=3, k2=5):
    c_ = int(co * e)
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c_),
            "cv2": B.conv_p(wm, f"{name}.cv2", ci, c_),
            "cv3": B.conv_p(wm, f"{name}.cv3", 2 * c_, co),
            "m": [_dsbottleneck_p(wm, f"{name}.m.{i}", c_, c_, e=1.0,
                                  k1=k1, k2=k2) for i in range(n)]}


def _dsc3k_a(p, x, shortcut=True):
    y = B.conv_a(p["cv1"], x)
    for m in p["m"]:
        y = _dsbottleneck_a(m, y, shortcut)
    return B.conv_a(p["cv3"],
                    jnp.concatenate([y, B.conv_a(p["cv2"], x)], -1))


def _dsc3k2_p(wm, name, ci, co, n, dsc3k, e=0.5):
    c = int(co * e)
    blocks = []
    for i in range(n):
        if dsc3k:
            blocks.append(_dsc3k_p(wm, f"{name}.m.{i}", c, c, n=2, k2=7))
        else:
            blocks.append(_dsbottleneck_p(wm, f"{name}.m.{i}", c, c,
                                          e=1.0, k1=3, k2=7))
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, 2 * c),
            "cv2": B.conv_p(wm, f"{name}.cv2", (2 + n) * c, co),
            "m": blocks}


def _dsc3k2_a(p, x, shortcut=True):
    y = B.conv_a(p["cv1"], x)
    c_ = y.shape[-1] // 2
    parts = [y[..., :c_], y[..., c_:]]
    cur = parts[1]
    for m in p["m"]:
        cur = (_dsc3k_a(m, cur, shortcut) if "cv3" in m
               else _dsbottleneck_a(m, cur, shortcut))
        parts.append(cur)
    return B.conv_a(p["cv2"], jnp.concatenate(parts, -1))


# --- area attention (v13 flavor: split qk/v) --------------------------------

def _cbn_p(wm, name, ci, co, k, groups=1):
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", co, ci, (k, k),
                      groups=groups, eps=1e-3)


def _aattn_p(wm, name, dim):
    return {"qk": _cbn_p(wm, f"{name}.qk", dim, 2 * dim, 1),
            "v": _cbn_p(wm, f"{name}.v", dim, dim, 1),
            "pe": _cbn_p(wm, f"{name}.pe", dim, dim, 5, groups=dim),
            "proj": _cbn_p(wm, f"{name}.proj", dim, dim, 1)}


def _aattn_a(ap, x, area):
    b, h, w, c = x.shape
    nh = c // 32
    n = (h * w) // area
    qk = nn.conv2d(x, ap["qk"]["w"], ap["qk"]["b"])
    v = nn.conv2d(x, ap["v"]["w"], ap["v"]["b"])
    pe = nn.conv2d(v, ap["pe"]["w"], ap["pe"]["b"], padding=2, groups=c)
    q, k = qk[..., :c], qk[..., c:]
    q = q.reshape(b, area, n, nh, 32)
    k = k.reshape(b, area, n, nh, 32)
    vv = v.reshape(b, area, n, nh, 32)
    attn = jnp.einsum("bande,bamde->badnm", q, k) / np.sqrt(32.0)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("badnm,bamde->bande", attn, vv).reshape(b, h, w, c)
    return nn.conv2d(out + pe, ap["proj"]["w"], ap["proj"]["b"])


def _ablock_p(wm, name, dim, mlp_ratio):
    return {"attn": _aattn_p(wm, f"{name}.attn", dim),
            "mlp0": B.conv_p(wm, f"{name}.mlp.0", dim, int(dim * mlp_ratio), 1),
            "mlp1": _cbn_p(wm, f"{name}.mlp.1", int(dim * mlp_ratio), dim, 1)}


def _ablock_a(p, x, area):
    x = x + _aattn_a(p["attn"], x, area)
    y = B.conv_a(p["mlp0"], x)
    return x + nn.conv2d(y, p["mlp1"]["w"], p["mlp1"]["b"])


def _a2c2f_p(wm, name, ci, co, n, a2, mlp_ratio, residual, e=0.5):
    c_ = int(co * e)
    p = {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c_),
         "cv2": B.conv_p(wm, f"{name}.cv2", (1 + n) * c_, co)}
    if a2:
        p["m"] = [[_ablock_p(wm, f"{name}.m.{i}.0", c_, mlp_ratio),
                   _ablock_p(wm, f"{name}.m.{i}.1", c_, mlp_ratio)]
                  for i in range(n)]
    else:
        p["mc"] = [B.c3k_p(wm, f"{name}.m.{i}", c_, c_, n=2)
                   for i in range(n)]
    if a2 and residual:
        p["gamma"] = wm.vec(f"{name}.gamma", co)
    return p


def _a2c2f_a(p, x, area):
    y = B.conv_a(p["cv1"], x)
    outs = [y]
    cur = y
    if "m" in p:
        for (b0, b1) in p["m"]:
            cur = _ablock_a(b1, _ablock_a(b0, cur, area), area)
            outs.append(cur)
    else:
        for mp in p["mc"]:
            cur = B.c3k_a(mp, cur, shortcut=True)
            outs.append(cur)
    out = B.conv_a(p["cv2"], jnp.concatenate(outs, -1))
    if "gamma" in p:
        out = x + p["gamma"].astype(out.dtype) * out
    return out


# --- HyperACE ----------------------------------------------------------------

def _lin_p(wm, name, ci, co):
    # addFullyConnected reads weight AND bias unconditionally (block.cpp:638)
    return {"w": wm.tensor(f"{name}.weight", (co, ci)).T.copy(),
            "b": wm.vec(f"{name}.bias", co)}


def _hyperedge_gen_p(wm, name, dim, edges):
    return {"ctx": _lin_p(wm, f"{name}.context_net", 2 * dim, edges * dim),
            "proto": wm.tensor(f"{name}.prototype_base", (edges, dim)),
            "pre": _lin_p(wm, f"{name}.pre_head_proj", dim, dim)}


def _hyperedge_gen_a(p, x, edges, nh):
    """x: (B, N, D) → participation A (B, N, E), softmax over N
    (block.cpp:607-699)."""
    b, n, d = x.shape
    ctx = jnp.concatenate([x.mean(1), x.max(1)], -1)          # (B, 2D)
    off = (ctx @ p["ctx"]["w"].astype(x.dtype)
           + p["ctx"]["b"].astype(x.dtype)).reshape(b, edges, d)
    protos = p["proto"].astype(x.dtype)[None] + off           # (B, E, D)
    xp = x @ p["pre"]["w"].astype(x.dtype) + p["pre"]["b"].astype(x.dtype)
    hd = d // nh
    xh = xp.reshape(b, n, nh, hd)
    ph = protos.reshape(b, edges, nh, hd)
    logits = jnp.einsum("bnhd,behd->bhne", xh, ph) / np.sqrt(hd)
    logits = logits.mean(1)                                   # (B, N, E)
    return jax.nn.softmax(logits, axis=1)                     # over nodes


def _hgconv_p(wm, name, dim, edges):
    return {"gen": _hyperedge_gen_p(wm, f"{name}.edge_generator", dim, edges),
            "edge": _lin_p(wm, f"{name}.edge_proj.0", dim, dim),
            "node": _lin_p(wm, f"{name}.node_proj.0", dim, dim)}


def _hgconv_a(p, x, edges, nh):
    a = _hyperedge_gen_a(p["gen"], x, edges, nh)              # (B, N, E)
    he = jnp.einsum("bne,bnd->bed", a, x)
    he = jax.nn.gelu(he @ p["edge"]["w"].astype(x.dtype)
                     + p["edge"]["b"].astype(x.dtype), approximate=True)
    xn = jnp.einsum("bne,bed->bnd", a, he)
    xn = jax.nn.gelu(xn @ p["node"]["w"].astype(x.dtype)
                     + p["node"]["b"].astype(x.dtype), approximate=True)
    return x + xn


def _c3ah_p(wm, name, ci, co, edges, e=1.0):
    c_ = int(co * e)
    return {"cv1": B.conv_p(wm, f"{name}.cv1", ci, c_),
            "cv2": B.conv_p(wm, f"{name}.cv2", ci, c_),
            "cv3": B.conv_p(wm, f"{name}.cv3", 2 * c_, co),
            "hg": _hgconv_p(wm, f"{name}.m.hgnn", c_, edges)}


def _c3ah_a(p, x, edges):
    y = B.conv_a(p["cv1"], x)
    b, h, w, c = y.shape
    tok = _hgconv_a(p["hg"], y.reshape(b, h * w, c), edges, max(1, c // 16))
    m = tok.reshape(b, h, w, c)
    return B.conv_a(p["cv3"],
                    jnp.concatenate([m, B.conv_a(p["cv2"], x)], -1))


def _hyperace_p(wm, name, ci_sum, c1, c2, n, edges, dsc3k, e1=0.5):
    c = int(c2 * e1)
    p = {"fuse": B.conv_p(wm, f"{name}.fuse.conv_out", ci_sum, c1),
         "cv1": B.conv_p(wm, f"{name}.cv1", c1, 3 * c),
         "br1": _c3ah_p(wm, f"{name}.branch1", c, c, edges),
         "br2": _c3ah_p(wm, f"{name}.branch2", c, c, edges),
         "cv2": B.conv_p(wm, f"{name}.cv2", (4 + n) * c, c2),
         "m": []}
    for i in range(n):
        if dsc3k:
            p["m"].append(_dsc3k_p(wm, f"{name}.m.{i}", c, c, n=2, k2=7))
        else:
            p["m"].append(_dsbottleneck_p(wm, f"{name}.m.{i}", c, c))
    return p


def _hyperace_a(p, x1, x2, x3, edges):
    """x1 @ 2× res of x2, x3 @ half res of x2 (model.cpp FuseModule)."""
    f = jnp.concatenate([nn.avg_pool(x1, 2, 2), x2,
                         nn.upsample_nearest(x3)], -1)
    f = B.conv_a(p["fuse"], f)
    y = B.conv_a(p["cv1"], f)
    c = y.shape[-1] // 3
    sl = [y[..., :c], y[..., c:2 * c], y[..., 2 * c:]]
    out1 = _c3ah_a(p["br1"], sl[1], edges)
    out2 = _c3ah_a(p["br2"], sl[1], edges)
    parts = [sl[0], out1, sl[2]]
    cur = sl[2]
    for m in p["m"]:
        cur = (_dsc3k_a(m, cur) if "cv3" in m else _dsbottleneck_a(m, cur))
        parts.append(cur)
    parts.append(out2)
    return B.conv_a(p["cv2"], jnp.concatenate(parts, -1))


def _fpt_p(wm, name):
    return {"gate": wm.vec(f"{name}.gate", 1)}


def _fpt_a(p, x0, x1):
    return x0 + p["gate"].astype(x0.dtype) * x1


# --- full model ---------------------------------------------------------------

def build_params(wm, cfg: Yolov13Cfg):
    w, d = _chans(cfg)
    big = cfg.big
    mlp = 1.5 if big else 2.0
    edges = _hyperedges(cfg)
    p = {
        "m0": B.conv_p(wm, "model.0", 3, w(64), 3),
        "m1": B.conv_p(wm, "model.1", w(64), w(128), 3, groups=2),
        "m2": _dsc3k2_p(wm, "model.2", w(128), w(256), d(2), big, e=0.25),
        "m3": B.conv_p(wm, "model.3", w(256), w(256), 3, groups=4),
        "m4": _dsc3k2_p(wm, "model.4", w(256), w(512), d(2), big, e=0.25),
        "m5": _dsconv_p(wm, "model.5", w(512), w(512), 3),
        "m6": _a2c2f_p(wm, "model.6", w(512), w(512), d(4), True, mlp, big),
        "m7": _dsconv_p(wm, "model.7", w(512), w(1024), 3),
        "m8": _a2c2f_p(wm, "model.8", w(1024), w(1024), d(4), True, mlp, big),
        "m9": _hyperace_p(wm, "model.9", w(512) + w(512) + w(1024),
                          w(512), w(512), d(2), edges, True),
        "m12": _fpt_p(wm, "model.12"), "m13": _fpt_p(wm, "model.13"),
        "m14": _fpt_p(wm, "model.14"),
        "m17": _dsc3k2_p(wm, "model.17", w(1024) + w(512), w(512), d(2), True),
        "m18": _fpt_p(wm, "model.18"),
        "m21": _dsc3k2_p(wm, "model.21", w(512) + w(512), w(256), d(2), True),
        "m22": B.conv_p(wm, "model.22", w(512), w(256), 1),
        "m23": _fpt_p(wm, "model.23"),
        "m24": B.conv_p(wm, "model.24", w(256), w(256), 3),
        "m26": _dsc3k2_p(wm, "model.26", w(256) + w(512), w(512), d(2), True),
        "m27": _fpt_p(wm, "model.27"),
        "m28": B.conv_p(wm, "model.28", w(512), w(512), 3),
        "m30": _dsc3k2_p(wm, "model.30", w(512) + w(1024), w(1024),
                         d(2), True),
        "m31": _fpt_p(wm, "model.31"),
    }
    if not cfg.big:  # DownsampleConv channel_adjust (model.cpp:874-888)
        p["m11"] = B.conv_p(wm, "model.11.channel_adjust", w(512), w(1024), 1)
    cfg11 = _Shim(cfg)
    p["head"] = _det_head_p(wm, cfg11, "model.32", cfg.num_classes)
    return p


class _Shim:
    def __init__(self, cfg):
        self.scale = "n"
        self.reg_max = cfg.reg_max
        self.multipliers = cfg.multipliers


def apply(params, x, cfg: Yolov13Cfg):
    y = B.conv_a(params["m0"], x, stride=2)
    y = B.conv_a(params["m1"], y, stride=2, groups=2)
    return _apply_from_stem(params, y, cfg)


def apply_s2d(params, x4, cfg: Yolov13Cfg):
    """Fused-serving fast path from the 4×4 space-to-depth letterbox
    tensor (models/yolo11.py apply_s2d rationale). m1 is a groups=2 conv:
    it runs as its exact dense block-diagonal expansion so the s2d
    rearrangement applies (ops/nn.dense_grouped_weights)."""
    y1 = nn.silu(nn.conv2d_s2d4(
        x4, nn.s2d4_conv_weights(params["m0"]["w"]), params["m0"]["b"]))
    w1 = nn.dense_grouped_weights(params["m1"]["w"], 2)
    y = nn.silu(nn.conv2d_s2d(
        y1, nn.s2d_conv_weights(w1), params["m1"]["b"]))
    return _apply_from_stem(params, y, cfg)


apply_s2d.factor = 4
apply_s2d.supports = lambda cfg: True


def _apply_from_stem(params, y, cfg: Yolov13Cfg):
    edges = _hyperedges(cfg)
    y = _dsc3k2_a(params["m2"], y)
    y = B.conv_a(params["m3"], y, stride=2, groups=4)
    c4 = _dsc3k2_a(params["m4"], y)
    y = _dsconv_a(params["m5"], c4, stride=2)
    c6 = _a2c2f_a(params["m6"], y, area=4)
    y = _dsconv_a(params["m7"], c6, stride=2)
    c8 = _a2c2f_a(params["m8"], y, area=1)
    c9 = _hyperace_a(params["m9"], c4, c6, c8, edges)      # @ /16
    up10 = nn.upsample_nearest(c9)                          # @ /8
    d11 = nn.avg_pool(c9, 2, 2)                             # @ /32
    if "m11" in params:
        d11 = B.conv_a(params["m11"], d11)
    c12 = _fpt_a(params["m12"], c6, c9)
    c13 = _fpt_a(params["m13"], c4, up10)
    c14 = _fpt_a(params["m14"], c8, d11)
    y = jnp.concatenate([nn.upsample_nearest(c14), c12], -1)
    c17 = _dsc3k2_a(params["m17"], y)
    c18 = _fpt_a(params["m18"], c17, c9)
    y = jnp.concatenate([nn.upsample_nearest(c17), c13], -1)
    c21 = _dsc3k2_a(params["m21"], y)
    c22 = B.conv_a(params["m22"], up10)
    p3 = _fpt_a(params["m23"], c21, c22)
    y = jnp.concatenate([B.conv_a(params["m24"], p3, stride=2), c18], -1)
    c26 = _dsc3k2_a(params["m26"], y)
    p4 = _fpt_a(params["m27"], c26, c9)
    y = jnp.concatenate([B.conv_a(params["m28"], c26, stride=2), c14], -1)
    c30 = _dsc3k2_a(params["m30"], y)
    p5 = _fpt_a(params["m31"], c30, d11)

    box_lv, cls_lv = _det_head_a(params["head"], [p3, p4, p5], cfg.reg_max)
    from tensorrtx_tpu.models.yolo11 import _decode_levels
    ltrb, conf, cls_id = _decode_levels(box_lv, cls_lv, cfg.reg_max)
    points, strides_flat = D.make_anchor_grid(cfg.input_h, cfg.input_w,
                                              (8, 16, 32))
    boxes = D.decode_boxes_ltrb(ltrb, points, strides_flat)
    if cfg.postprocess == "raw":
        return {"boxes": boxes, "conf": conf, "cls": cls_id}
    return select_and_nms(boxes, conf, cls_id, cfg.conf_thresh,
                          cfg.nms_thresh, cfg.max_det).as_dict()


register(ModelDef(
    name="yolov13",
    build_params=build_params,
    apply=apply,
    apply_s2d=apply_s2d,
    default_cfg=Yolov13Cfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="YOLOv13 det, HyperACE hypergraph + area attention (reference: yolov13/)",
))
