"""CenterNet DLA34 + DCNv2 (heatmap/wh/reg heads).

Reference: centernet/centernet.py (python TRT builder; tree recursion
:111-143, IDA/DLA-up with DCNv2 + grouped deconv :171-243, heads :245-257)
+ centernet/dcnv2Plugin/dcn_v2_im2col_cuda.cu (≙ ops.dcn.dcn_v2).

Weight naming is the torch checkpoint's ("module." prefix). The offset/mask
conv keeps the raw training-time channel layout: [:2K] offsets read as
(dy, dx) pairs per tap, [2K:] sigmoid mask (plugin input wiring,
centernet.py:176-210).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.dcn import dcn_v2

LEVELS = [1, 1, 1, 2, 2, 1]
CHANNELS = [16, 32, 64, 128, 256, 512]
FIRST_LEVEL = 2   # log2(down_ratio=4)
LAST_LEVEL = 5


@dataclasses.dataclass
class CenternetCfg:
    input_h: int = 512
    input_w: int = 512
    num_classes: int = 80
    max_det: int = 100
    score_thresh: float = 0.3


def _basic_a(p, x, residual, stride=1):
    y = jax.nn.relu(nn.conv2d(x, p["c1"]["w"], p["c1"]["b"], stride=stride,
                              padding=1))
    y = nn.conv2d(y, p["c2"]["w"], p["c2"]["b"], padding=1)
    return jax.nn.relu(y + residual)


def _conv_bn(wm, conv_prefix, bn_prefix, co, ci, k):
    w = wm.tensor(f"{conv_prefix}.weight", (co, ci, k, k))
    w = np.transpose(w, (2, 3, 1, 0))
    g = wm.vec(f"{bn_prefix}.weight", co)
    b = wm.vec(f"{bn_prefix}.bias", co)
    m = wm.vec(f"{bn_prefix}.running_mean", co)
    v = wm.vec(f"{bn_prefix}.running_var", co)
    s = g / np.sqrt(v + 1e-5)
    return {"w": w * s[None, None, None, :], "b": b - m * s}


def _basic_params(wm, name, ci, co):
    return {"c1": _conv_bn(wm, f"{name}.conv1", f"{name}.bn1", co, ci, 3),
            "c2": _conv_bn(wm, f"{name}.conv2", f"{name}.bn2", co, co, 3)}


def _root_params(wm, name, ci, co):
    return {"conv": _conv_bn(wm, f"{name}.conv", f"{name}.bn", co, ci, 1)}


def _tree_params(wm, name, level, cin, cout, level_root):
    """Mirrors add_tree (centernet.py:111-143); the channel bookkeeping
    tracks the concat widths feeding each root."""
    p = {}
    if cin != cout:
        p["project"] = _conv_bn(wm, f"{name}.project.0", f"{name}.project.1",
                                cout, cin, 1)
    if level == 1:
        p["tree1"] = _basic_params(wm, f"{name}.tree1", cin, cout)
        p["tree2"] = _basic_params(wm, f"{name}.tree2", cout, cout)
        root_in = 2 * cout + (cin if level_root else 0)
        p["root"] = _root_params(wm, f"{name}.root", root_in, cout)
    else:
        # level == 2 in DLA34
        p["tree1"] = _tree_params(wm, f"{name}.tree1", 1, cin, cout, False)
        p["tree2"] = {}
        t2 = p["tree2"]
        t2["tree1"] = _basic_params(wm, f"{name}.tree2.tree1", cout, cout)
        t2["tree2"] = _basic_params(wm, f"{name}.tree2.tree2", cout, cout)
        root_in = 2 * cout + cout + (cin if level_root else 0)
        t2["root"] = _root_params(wm, f"{name}.tree2.root", root_in, cout)
    return p


def _root_a(p, feats):
    cat = jnp.concatenate(feats, -1)
    y = nn.conv2d(cat, p["conv"]["w"], p["conv"]["b"])
    return jax.nn.relu(y)


def _tree_a(p, x, level, cout, stride, level_root):
    bottom = nn.max_pool(x, stride, stride) if stride > 1 else x
    residual = _apply_cb(p["project"], bottom) if "project" in p else bottom
    if level == 1:
        t1 = _basic_a(p["tree1"], x, residual, stride)
        t2 = _basic_a(p["tree2"], t1, t1)
        feats = [t2, t1] + ([bottom] if level_root else [])
        return _root_a(p["root"], feats)
    t1 = _tree_a(p["tree1"], x, 1, cout, stride, False)
    t2p = p["tree2"]
    u1 = _basic_a(t2p["tree1"], t1, t1)
    u2 = _basic_a(t2p["tree2"], u1, u1)
    # children accumulate as [bottom][t1] (centernet.py:131-143: level_root
    # appends bottom BEFORE tree1), so the root cat order is u2,u1,bottom,t1
    feats = [u2, u1] + ([bottom] if level_root else []) + [t1]
    return _root_a(t2p["root"], feats)


def _apply_cb(p, x, stride=1, padding=0):
    return nn.conv2d(x, p["w"], p["b"], stride=stride, padding=padding)


def _dcn_params(wm, name, co, ci):
    return {
        "offs_w": np.transpose(
            wm.tensor(f"{name}.conv.conv_offset_mask.weight",
                      (27, ci, 3, 3)), (2, 3, 1, 0)),
        "offs_b": wm.vec(f"{name}.conv.conv_offset_mask.bias", 27),
        "w": np.transpose(wm.tensor(f"{name}.conv.weight", (co, ci, 3, 3)),
                          (2, 3, 1, 0)),
        "b": wm.vec(f"{name}.conv.bias", co),
        "bn": _bn_affine(wm, f"{name}.actf.0", co),
    }


def _bn_affine(wm, prefix, ch):
    g = wm.vec(f"{prefix}.weight", ch)
    b = wm.vec(f"{prefix}.bias", ch)
    m = wm.vec(f"{prefix}.running_mean", ch)
    v = wm.vec(f"{prefix}.running_var", ch)
    s = g / np.sqrt(v + 1e-5)
    return {"s": s, "b": b - m * s}


def _dcn_a(p, x):
    om = nn.conv2d(x, p["offs_w"], p["offs_b"], padding=1)  # (B,H,W,27)
    offset = om[..., :18].astype(jnp.float32)
    mask = jax.nn.sigmoid(om[..., 18:].astype(jnp.float32))
    y = dcn_v2(x, offset, mask, p["w"], p["b"], padding=1)
    bn = p["bn"]
    y = y * bn["s"].astype(y.dtype) + bn["b"].astype(y.dtype)
    return jax.nn.relu(y)


def _up_params(wm, name, ch, f):
    # grouped deconv (2f x 2f, stride f, groups=ch, no bias): torch weight
    # (ch, 1, 2f, 2f) → (kh, kw, out_per_group=1, in=ch)
    w = wm.tensor(f"{name}.weight", (ch, 1, 2 * f, 2 * f))
    return {"w": np.transpose(w, (2, 3, 1, 0))}


def _ida_params(wm, name, chans_in, cout, up_f, startp):
    p = {}
    for i in range(startp + 1, len(chans_in)):
        k = i - startp
        p[f"proj_{k}"] = _dcn_params(wm, f"{name}.proj_{k}", cout,
                                     chans_in[i])
        p[f"up_{k}"] = _up_params(wm, f"{name}.up_{k}", cout, up_f[k])
        p[f"node_{k}"] = _dcn_params(wm, f"{name}.node_{k}", cout, cout)
    return p


def _ida_a(p, tensors, up_f, startp):
    tensors = list(tensors)
    for i in range(startp + 1, len(tensors)):
        k = i - startp
        proj = _dcn_a(p[f"proj_{k}"], tensors[i])
        f = up_f[k]
        up = nn.conv_transpose2d(proj, jnp.asarray(p[f"up_{k}"]["w"]),
                                 stride=f, padding=f // 2,
                                 groups=proj.shape[-1])
        node = tensors[i - 1] + up
        tensors[i] = _dcn_a(p[f"node_{k}"], node)
    return tensors


def build_params(wm, cfg: CenternetCfg):
    base = "module.base"
    p = {"base": _conv_bn(wm, f"{base}.base_layer.0", f"{base}.base_layer.1",
                          16, 3, 7),
         "level0": _conv_bn(wm, f"{base}.level0.0", f"{base}.level0.1",
                            16, 16, 3),
         "level1": _conv_bn(wm, f"{base}.level1.0", f"{base}.level1.1",
                            32, 16, 3),
         "level2": _tree_params(wm, f"{base}.level2", 1, 32, 64, False),
         "level3": _tree_params(wm, f"{base}.level3", 2, 64, 128, True),
         "level4": _tree_params(wm, f"{base}.level4", 2, 128, 256, True),
         "level5": _tree_params(wm, f"{base}.level5", 1, 256, 512, True)}

    # dla_up: ida_0 over [.., 256, 512] → 256; ida_1 over [128, 256, 256]
    # → 128; ida_2 over [64, 128, 128, 128] → 64 (centernet.py:231-243)
    p["dla_ida_0"] = _ida_params(wm, "module.dla_up.ida_0",
                                 [64, 128, 256, 512], 256, [1, 2], 2)
    p["dla_ida_1"] = _ida_params(wm, "module.dla_up.ida_1",
                                 [64, 128, 256, 256], 128, [1, 2, 2], 1)
    p["dla_ida_2"] = _ida_params(wm, "module.dla_up.ida_2",
                                 [64, 128, 128, 128], 64, [1, 2, 2, 2], 0)
    p["ida_up"] = _ida_params(wm, "module.ida_up", [64, 128, 256], 64,
                              [1, 2, 4], 0)
    for head, ch in (("hm", cfg.num_classes), ("wh", 2), ("reg", 2)):
        w0 = wm.tensor(f"module.{head}.0.weight", (256, 64, 3, 3))
        w2 = wm.tensor(f"module.{head}.2.weight", (ch, 256, 1, 1))
        p[head] = {"c0": {"w": np.transpose(w0, (2, 3, 1, 0)),
                          "b": wm.vec(f"module.{head}.0.bias", 256)},
                   "c2": {"w": np.transpose(w2, (2, 3, 1, 0)),
                          "b": wm.vec(f"module.{head}.2.bias", ch)}}
    return p


def apply(params, x, cfg: CenternetCfg):
    """x: (1, H, W, 3) normalized → {hm, wh, reg} maps at stride 4 +
    decoded top-k detections."""
    y = jax.nn.relu(_apply_cb(params["base"], x, padding=3))
    l0 = jax.nn.relu(_apply_cb(params["level0"], y, padding=1))
    l1 = jax.nn.relu(_apply_cb(params["level1"], l0, stride=2, padding=1))
    l2 = _tree_a(params["level2"], l1, 1, 64, 2, False)
    l3 = _tree_a(params["level3"], l2, 2, 128, 2, True)
    l4 = _tree_a(params["level4"], l3, 2, 256, 2, True)
    l5 = _tree_a(params["level5"], l4, 1, 512, 2, True)

    t = [l2, l3, l4, l5]
    out = [t[-1]]
    t = _ida_a(params["dla_ida_0"], t, [1, 2], 2)
    out.insert(0, t[-1])
    t = _ida_a(params["dla_ida_1"], t, [1, 2, 2], 1)
    out.insert(0, t[-1])
    t = _ida_a(params["dla_ida_2"], t, [1, 2, 2, 2], 0)
    out.insert(0, t[-1])

    ida = _ida_a(params["ida_up"], out[:LAST_LEVEL - FIRST_LEVEL],
                 [1, 2, 4], 0)
    feat = ida[-1]

    def head(p):
        h = jax.nn.relu(nn.conv2d(feat, p["c0"]["w"], p["c0"]["b"],
                                  padding=1))
        return nn.conv2d(h, p["c2"]["w"], p["c2"]["b"])

    hm = jax.nn.sigmoid(head(params["hm"]).astype(jnp.float32))
    wh = head(params["wh"]).astype(jnp.float32)
    reg = head(params["reg"]).astype(jnp.float32)

    # CenterNet decode: 3x3 max-pool peak NMS + top-k over the heatmap
    peak = nn.max_pool(hm, 3, 1, 1)
    hm_nms = jnp.where(hm == peak, hm, 0.0)
    b, fh, fw, nc = hm_nms.shape
    flat = hm_nms.reshape(b, -1)
    scores, idx = jax.lax.top_k(flat, cfg.max_det)
    cls = (idx % nc).astype(jnp.float32)
    pix = idx // nc
    ys = (pix // fw).astype(jnp.float32)
    xs = (pix % fw).astype(jnp.float32)
    wh_flat = wh.reshape(b, -1, 2)
    reg_flat = reg.reshape(b, -1, 2)
    g = jnp.take_along_axis(wh_flat, pix[..., None], 1)
    r = jnp.take_along_axis(reg_flat, pix[..., None], 1)
    cx = (xs + r[..., 0]) * 4.0
    cy = (ys + r[..., 1]) * 4.0
    bw = g[..., 0] * 4.0
    bh = g[..., 1] * 4.0
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                      -1)
    return {"hm": hm, "wh": wh, "reg": reg, "boxes": boxes,
            "scores": scores, "classes": cls,
            "count": jnp.sum(scores >= cfg.score_thresh, -1)}


register(ModelDef(
    name="centernet",
    build_params=build_params,
    apply=apply,
    default_cfg=CenternetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="CenterNet DLA34 + DCNv2 (reference: centernet/centernet.py)",
))
