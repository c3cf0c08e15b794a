"""RT-DETR document models: layout detection + table cell detection.

Reference: ppocrv5/src/model.cpp:2436-2512 (buildRtDetrDocumentModel),
:1043-1222 (HGNet-ByPrefix backbone + hybrid encoder),
:1279-1389 (decoder layers), plugin/ppocrv5_rtdetr_layer.cu (deformable
attention — TPU equivalent in ops/deform_attn.py).

Deployed names (ppocr_system.cpp:1273-1281): pp_docblocklayout,
pp_doclayout_plus_l (800x800), rt_detr_l_wired_table_cell_det,
rt_detr_l_wireless_table_cell_det (640x640).

Pipeline: HGNetV2 backbone → AIFI self-attention on P5 + CSP-PAN fusion →
flattened 3-level memory → top-300 query selection from encoder logits →
6 decoder layers (self-attn + multi-scale deformable cross-attn +
iterative box refinement) → sigmoid boxes (cxcywh, normalized) + scores.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models import _paddle as P
from tensorrtx_tpu.models.ppocr_hgnet import (apply_hg_block,
                                              build_hg_conv_block,
                                              build_hg_light_block,
                                              build_hg_standard_block)
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.deform_attn import ms_deform_attn

NUM_QUERIES = 300
HEADS = 8
HEAD_DIM = 32


@dataclasses.dataclass
class RtDetrCfg:
    input_h: int = 640
    input_w: int = 640
    num_classes: int = 25
    score_thresh: float = 0.5


def _cb(wm, conv, bn, co, ci, k, groups=1):
    return P.pconv_bn(wm, f"conv2d_{conv}", f"batch_norm2d_{bn}", co, ci, k,
                      groups=groups)


def _conv_bias(wm, n, co, ci, k):
    return P.pconv(wm, f"conv2d_{n}", co, ci, k)


def _csp_rep(wm, base_conv, base_bn, reps, short_conv, short_bn, cin):
    return {"left": _cb(wm, base_conv, base_bn, 256, cin, 1),
            "reps": [_conv_bias(wm, r, 256, 256, 3) for r in reps],
            "short": _cb(wm, short_conv, short_bn, 256, cin, 1)}


def build_params(wm, cfg: RtDetrCfg):
    p5 = cfg.input_h // 32
    p = {"stem0": _cb(wm, 0, 80, 32, 3, 3),
         "stem1": _cb(wm, 1, 81, 16, 32, 2),
         "stem2": _cb(wm, 2, 82, 32, 16, 2),
         "prep0": _cb(wm, 3, 83, 32, 64, 3),
         "prep1": _cb(wm, 4, 84, 48, 32, 1)}
    p["b_c3"] = build_hg_conv_block(wm, 48, 48, 6, 5, 85, 11, 91, 64, 12, 92,
                                    128)
    p["b_c4low"] = build_hg_standard_block(wm, 128, 96, 6, 13, 93, 128,
                                           (2, 2), 14, 94, 20, 100, 256,
                                           21, 101, 512)
    p["s3down"] = _cb(wm, 22, 102, 512, 512, 3, groups=512)
    p["s3a"] = build_hg_light_block(wm, 512, 192, 6, 23, 103, 35, 115, 512,
                                    36, 116, 1024, False)
    p["s3b"] = build_hg_light_block(wm, 1024, 192, 6, 37, 117, 49, 129, 512,
                                    50, 130, 1024, True)
    p["b_c4"] = build_hg_light_block(wm, 1024, 192, 6, 51, 131, 63, 143, 512,
                                     64, 144, 1024, True)
    p["s4down"] = _cb(wm, 65, 145, 1024, 1024, 3, groups=1024)
    p["b_c5"] = build_hg_light_block(wm, 1024, 384, 6, 66, 146, 78, 158,
                                     1024, 79, 159, 2048, False)

    p["c3proj"] = _cb(wm, 80, 160, 256, 512, 1)
    p["c4proj"] = _cb(wm, 81, 161, 256, 1024, 1)
    p["c5proj"] = _cb(wm, 82, 162, 256, 2048, 1)
    p["enc_pos"] = wm.tensor(P.by_prefix(wm, "eager_tmp_0"), (1, p5 * p5, 256))
    p["enc_q"] = P.plinear_part(wm, "multi_head_attention_0", 256, 256, 0)
    p["enc_k"] = P.plinear_part(wm, "multi_head_attention_0", 256, 256, 1)
    p["enc_v"] = P.plinear_part(wm, "multi_head_attention_0", 256, 256, 2)
    p["enc_proj"] = P.plinear(wm, "linear_0", 256, 256)
    p["enc_ln0"] = P.pln(wm, "layer_norm_0", 256)
    p["enc_mlp0"] = P.plinear(wm, "linear_1", 256, 1024)
    p["enc_mlp1"] = P.plinear(wm, "linear_2", 1024, 256)
    p["enc_ln1"] = P.pln(wm, "layer_norm_1", 256)

    p["fpn5"] = _cb(wm, 83, 163, 256, 256, 1)
    p["td4"] = _csp_rep(wm, 84, 164, (122, 123, 124), 85, 165, 512)
    p["fpn4"] = _cb(wm, 92, 172, 256, 256, 1)
    p["td3"] = _csp_rep(wm, 93, 173, (125, 126, 127), 94, 174, 512)
    p["p3down"] = _cb(wm, 101, 181, 256, 256, 3)
    p["bu4"] = _csp_rep(wm, 102, 182, (128, 129, 130), 103, 183, 512)
    p["p4down"] = _cb(wm, 110, 190, 256, 256, 3)
    p["bu5"] = _csp_rep(wm, 111, 191, (131, 132, 133), 112, 192, 512)
    p["m3"] = _cb(wm, 119, 199, 256, 256, 1)
    p["m4"] = _cb(wm, 120, 200, 256, 256, 1)
    p["m5"] = _cb(wm, 121, 201, 256, 256, 1)

    L = (cfg.input_h // 8) ** 2 + (cfg.input_h // 16) ** 2 + p5 * p5
    p["enc_out_proj"] = P.plinear(wm, "linear_12", 256, 256)
    p["enc_out_ln"] = P.pln(wm, "layer_norm_5", 256)
    p["enc_score"] = P.plinear(wm, "linear_13", 256, cfg.num_classes)
    p["enc_box0"] = P.plinear(wm, "linear_14", 256, 256)
    p["enc_box1"] = P.plinear(wm, "linear_15", 256, 256)
    p["enc_box2"] = P.plinear(wm, "linear_16", 256, 4)
    p["anchors"] = wm.tensor(P.by_prefix(wm, "eager_tmp_1"), (1, L, 4))

    p["qpos0"] = P.plinear(wm, "linear_10", 4, 512)
    p["qpos1"] = P.plinear(wm, "linear_11", 512, 256)
    p["dec"] = []
    for i in range(6):
        p["dec"].append({
            "q": P.plinear_part_ord(wm, "multi_head_attention_1", i, 256,
                                    256, 0),
            "k": P.plinear_part_ord(wm, "multi_head_attention_1", i, 256,
                                    256, 1),
            "v": P.plinear_part_ord(wm, "multi_head_attention_1", i, 256,
                                    256, 2),
            "self_proj": P.plinear_ord(wm, "linear_3", i, 256, 256),
            "self_ln": P.pln_ord(wm, "layer_norm_2", i, 256),
            "value": P.plinear_ord(wm, "linear_6", i, 256, 256),
            "offsets": P.plinear_ord(wm, "linear_4", i, 256, 192),
            "attn": P.plinear_ord(wm, "linear_5", i, 256, 96),
            "cross_proj": P.plinear_ord(wm, "linear_7", i, 256, 256),
            "cross_ln": P.pln_ord(wm, "layer_norm_3", i, 256),
            "ffn0": P.plinear_ord(wm, "linear_8", i, 256, 1024),
            "ffn1": P.plinear_ord(wm, "linear_9", i, 1024, 256),
            "ffn_ln": P.pln_ord(wm, "layer_norm_4", i, 256),
            "box0": P.plinear(wm, f"linear_{23 + i * 3}", 256, 256),
            "box1": P.plinear(wm, f"linear_{24 + i * 3}", 256, 256),
            "box2": P.plinear(wm, f"linear_{25 + i * 3}", 256, 4),
        })
    p["logits"] = P.plinear(wm, "linear_22", 256, cfg.num_classes)
    return p


def _silu(x):
    return nn.silu(x)


def _csp_rep_apply(bp, x):
    left = _silu(P.conv(x, bp["left"]))
    r = left
    for rp in bp["reps"]:
        r = _silu(P.conv(r, rp, padding=1))
    short = _silu(P.conv(x, bp["short"]))
    return r + short


def _mha(q, k, v, proj, heads=HEADS, hd=HEAD_DIM):
    """(1, T, 256) tensors; scale applied to qk (model.cpp:1110-1118)."""
    b, t, c = q.shape
    tq = q.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    tk = k.reshape(b, k.shape[1], heads, hd).transpose(0, 2, 1, 3)
    tv = v.reshape(b, v.shape[1], heads, hd).transpose(0, 2, 1, 3)
    qk = (tq @ tk.transpose(0, 1, 3, 2)) / np.sqrt(hd)
    ctx = (jax.nn.softmax(qk, axis=-1) @ tv).transpose(0, 2, 1, 3)
    return P.linear(ctx.reshape(b, t, c), proj)


def _inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


def apply(params, x, cfg: RtDetrCfg):
    """x: (1, H, W, 3) imagenet-normalized → {boxes (1,300,4) cxcywh
    normalized, scores (1,300,num_classes) sigmoid}."""
    from tensorrtx_tpu.models.ppocr_hgnet import (_same_cbr2, _same_pool2)

    s0 = jax.nn.relu(P.conv(x, params["stem0"], stride=2, padding=1))
    s1 = _same_cbr2(s0, params["stem1"])
    s2 = _same_cbr2(s1, params["stem2"])
    y = jnp.concatenate([_same_pool2(s0), s2], axis=-1)
    y = jax.nn.relu(P.conv(y, params["prep0"], stride=2, padding=1))
    y = jax.nn.relu(P.conv(y, params["prep1"]))
    y = apply_hg_block(params["b_c3"], y)
    c3 = apply_hg_block(params["b_c4low"], y, first_stride=(2, 2))
    y = P.conv(c3, params["s3down"], stride=2, padding=1, groups=512)
    y = apply_hg_block(params["s3a"], y)
    y = apply_hg_block(params["s3b"], y, residual=True)
    c4 = apply_hg_block(params["b_c4"], y, residual=True)
    y = P.conv(c4, params["s4down"], stride=2, padding=1, groups=1024)
    c5 = apply_hg_block(params["b_c5"], y)

    c3p = P.conv(c3, params["c3proj"])
    c4p = P.conv(c4, params["c4proj"])
    c5p = P.conv(c5, params["c5proj"])

    b, h5, w5, _ = c5p.shape
    seq = c5p.reshape(b, h5 * w5, 256)
    with_pos = seq + params["enc_pos"].astype(seq.dtype)
    attn = _mha(P.linear(with_pos, params["enc_q"]),
                P.linear(with_pos, params["enc_k"]),
                P.linear(seq, params["enc_v"]), params["enc_proj"])
    n0 = P.layer_norm(seq + attn, params["enc_ln0"], eps=1e-5)
    m = P.linear(n0, params["enc_mlp0"])
    m = nn.gelu_erf(m)
    m = P.linear(m, params["enc_mlp1"])
    enc5 = P.layer_norm(n0 + m, params["enc_ln1"], eps=1e-5)
    enc5 = enc5.reshape(b, h5, w5, 256)

    fpn5 = _silu(P.conv(enc5, params["fpn5"]))
    td4 = _csp_rep_apply(params["td4"], jnp.concatenate(
        [nn.upsample_nearest(fpn5), c4p], axis=-1))
    fpn4 = _silu(P.conv(td4, params["fpn4"]))
    p3 = _csp_rep_apply(params["td3"], jnp.concatenate(
        [nn.upsample_nearest(fpn4), c3p], axis=-1))
    p4 = _csp_rep_apply(params["bu4"], jnp.concatenate(
        [_silu(P.conv(p3, params["p3down"], stride=2, padding=1)), fpn4],
        axis=-1))
    p5 = _csp_rep_apply(params["bu5"], jnp.concatenate(
        [_silu(P.conv(p4, params["p4down"], stride=2, padding=1)), fpn5],
        axis=-1))

    m3 = P.conv(p3, params["m3"])
    m4 = P.conv(p4, params["m4"])
    m5 = P.conv(p5, params["m5"])
    memory = jnp.concatenate(
        [m3.reshape(b, -1, 256), m4.reshape(b, -1, 256),
         m5.reshape(b, -1, 256)], axis=1)  # (1, L, 256)
    level_sizes = [(m3.shape[1], m3.shape[2]), (m4.shape[1], m4.shape[2]),
                   (m5.shape[1], m5.shape[2])]

    enc_norm = P.layer_norm(P.linear(memory, params["enc_out_proj"]),
                            params["enc_out_ln"], eps=1e-5)
    enc_scores = P.linear(enc_norm, params["enc_score"])
    bx = jax.nn.relu(P.linear(enc_norm, params["enc_box0"]))
    bx = jax.nn.relu(P.linear(bx, params["enc_box1"]))
    enc_boxes = P.linear(bx, params["enc_box2"]) + \
        params["anchors"].astype(bx.dtype)

    score_max = jnp.max(enc_scores, axis=-1)  # (1, L)
    _, top_idx = jax.lax.top_k(score_max[0], NUM_QUERIES)
    reference = jax.nn.sigmoid(enc_boxes[0, top_idx])[None]  # (1, 300, 4)
    target = enc_norm[0, top_idx][None]  # (1, 300, 256)

    for dp in params["dec"]:
        qpos = jax.nn.relu(P.linear(reference, params["qpos0"]))
        qpos = P.linear(qpos, params["qpos1"])
        twp = target + qpos
        self_attn = _mha(P.linear(twp, dp["q"]), P.linear(twp, dp["k"]),
                         P.linear(target, dp["v"]), dp["self_proj"])
        target = P.layer_norm(target + self_attn, dp["self_ln"], eps=1e-5)
        value = P.linear(memory, dp["value"]).reshape(
            memory.shape[1], HEADS, HEAD_DIM)
        offsets = P.linear(target, dp["offsets"]).reshape(
            NUM_QUERIES, HEADS, 3, 4, 2)
        aw = P.linear(target, dp["attn"]).reshape(NUM_QUERIES, HEADS, 12)
        aw = jax.nn.softmax(aw, axis=-1).reshape(NUM_QUERIES, HEADS, 3, 4)
        cross = ms_deform_attn(value, reference[0], offsets, aw, level_sizes)
        cross = P.linear(cross[None], dp["cross_proj"])
        target = P.layer_norm(target + cross, dp["cross_ln"], eps=1e-5)
        f = jax.nn.relu(P.linear(target, dp["ffn0"]))
        f = P.linear(f, dp["ffn1"])
        target = P.layer_norm(target + f, dp["ffn_ln"], eps=1e-5)
        bu = jax.nn.relu(P.linear(target, dp["box0"]))
        bu = jax.nn.relu(P.linear(bu, dp["box1"]))
        bu = P.linear(bu, dp["box2"])
        reference = jax.nn.sigmoid(bu + _inverse_sigmoid(reference))

    scores = jax.nn.sigmoid(P.linear(target, params["logits"]))
    return {"boxes": reference, "scores": scores}


def postprocess(out, cfg: RtDetrCfg):
    boxes = np.asarray(out["boxes"])[0]
    scores = np.asarray(out["scores"])[0]
    cls = scores.argmax(-1)
    conf = scores.max(-1)
    keep = conf >= cfg.score_thresh
    # cxcywh (normalized) → xyxy (normalized)
    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    xyxy = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return [{"box": xyxy[i].tolist(), "cls": int(cls[i]),
             "score": float(conf[i])} for i in np.nonzero(keep)[0]]


for _name, _size, _nc in (("pp_docblocklayout", 640, 25),
                          ("pp_doclayout_plus_l", 800, 25),
                          ("rt_detr_l_wired_table_cell_det", 640, 1),
                          ("rt_detr_l_wireless_table_cell_det", 640, 1)):
    register(ModelDef(
        name=_name,
        build_params=build_params,
        apply=apply,
        default_cfg=(lambda s, n: (lambda: RtDetrCfg(
            input_h=s, input_w=s, num_classes=n)))(_size, _nc),
        input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
        postprocess=postprocess,
        doc="RT-DETR document model (reference: ppocrv5/src/model.cpp:2436)",
    ))
