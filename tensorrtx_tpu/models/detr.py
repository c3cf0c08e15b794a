"""DETR-R50/R101 set-prediction detector.

Reference: detr/detr.cpp (PositionEmbeddingSine:31, MultiHeadAttention:111,
Encoder/DecoderLayer:262/330, Transformer:433, createEngine_r50detr:531).
100 learned queries, no NMS; outputs per-query softmax class scores and
sigmoid cxcywh boxes.

Weights: facebookresearch/detr state_dict, with each `in_proj_weight/bias`
split into `_q/_k/_v` tensors by the exporter (detr/gen_wts.py:32-53).

TPU design: the whole post-norm transformer is einsum/LN expressions fused
into one program; the sine position embedding is precomputed at build time.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.resnet import backbone_apply, build_backbone_params
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class DETRCfg:
    variant: str = "resnet50"
    d_model: int = 256
    nhead: int = 8
    ffn: int = 2048
    enc_layers: int = 6
    dec_layers: int = 6
    num_queries: int = 100
    num_classes: int = 92   # 91 + no-object (detr/gen_wts.py:64)
    input_h: int = 800
    input_w: int = 800
    # "hwc": (B, H, W, 3) floats; "s2d2": the (B, H/2, W/2, 12) 2×2
    # space-to-depth pixel shuffle done host-side (free during
    # preprocessing; on-device it is a pathological 3-channel relayout)
    input_format: str = "hwc"


def position_embedding_sine(h, w, num_pos_feats=128, temperature=10000):
    """facebookresearch/detr sine embedding (detr.cpp:31-110): (h*w, 2*npf)."""
    ys = np.arange(1, h + 1, dtype=np.float32)
    xs = np.arange(1, w + 1, dtype=np.float32)
    eps, scale = 1e-6, 2 * math.pi
    y_embed = ys / (h + eps) * scale
    x_embed = xs / (w + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)
    pos_x = x_embed[:, None] / dim_t[None, :]        # (w, npf)
    pos_y = y_embed[:, None] / dim_t[None, :]        # (h, npf)
    pos_x = np.where(np.arange(num_pos_feats) % 2 == 1, np.cos(pos_x), np.sin(pos_x))
    pos_y = np.where(np.arange(num_pos_feats) % 2 == 1, np.cos(pos_y), np.sin(pos_y))
    out = np.zeros((h, w, 2 * num_pos_feats), np.float32)
    out[:, :, :num_pos_feats] = pos_y[:, None, :]
    out[:, :, num_pos_feats:] = pos_x[None, :, :]
    return out.reshape(h * w, 2 * num_pos_feats)


def _lin(wm, name, out_f, in_f):
    return {"w": wm.tensor(f"{name}.weight", (out_f, in_f)).T.copy(),
            "b": wm.vec(f"{name}.bias", out_f)}


def _split_attn(wm, name, d):
    return {
        "q": {"w": wm.tensor(f"{name}.in_proj_weight_q", (d, d)).T.copy(),
              "b": wm.vec(f"{name}.in_proj_bias_q", d)},
        "k": {"w": wm.tensor(f"{name}.in_proj_weight_k", (d, d)).T.copy(),
              "b": wm.vec(f"{name}.in_proj_bias_k", d)},
        "v": {"w": wm.tensor(f"{name}.in_proj_weight_v", (d, d)).T.copy(),
              "b": wm.vec(f"{name}.in_proj_bias_v", d)},
        "out": _lin(wm, f"{name}.out_proj", d, d),
    }


def _ln(wm, name, d):
    return {"g": wm.vec(f"{name}.weight", d), "b": wm.vec(f"{name}.bias", d)}


def build_params(wm, cfg: DETRCfg):
    d = cfg.d_model
    p = {"backbone": build_backbone_params(wm, cfg.variant, "backbone.0.body."),
         "input_proj": wm.conv2d("input_proj", d, 2048, (1, 1)),
         "query": wm.tensor("query_embed.weight", (cfg.num_queries, d)),
         "class_embed": _lin(wm, "class_embed", cfg.num_classes, d),
         "bbox0": _lin(wm, "bbox_embed.layers.0", d, d),
         "bbox1": _lin(wm, "bbox_embed.layers.1", d, d),
         "bbox2": _lin(wm, "bbox_embed.layers.2", 4, d),
         "enc": [], "dec": []}
    for i in range(cfg.enc_layers):
        pre = f"transformer.encoder.layers.{i}"
        p["enc"].append({
            "attn": _split_attn(wm, f"{pre}.self_attn", d),
            "l1": _lin(wm, f"{pre}.linear1", cfg.ffn, d),
            "l2": _lin(wm, f"{pre}.linear2", d, cfg.ffn),
            "n1": _ln(wm, f"{pre}.norm1", d),
            "n2": _ln(wm, f"{pre}.norm2", d),
        })
    for i in range(cfg.dec_layers):
        pre = f"transformer.decoder.layers.{i}"
        p["dec"].append({
            "self": _split_attn(wm, f"{pre}.self_attn", d),
            "cross": _split_attn(wm, f"{pre}.multihead_attn", d),
            "l1": _lin(wm, f"{pre}.linear1", cfg.ffn, d),
            "l2": _lin(wm, f"{pre}.linear2", d, cfg.ffn),
            "n1": _ln(wm, f"{pre}.norm1", d),
            "n2": _ln(wm, f"{pre}.norm2", d),
            "n3": _ln(wm, f"{pre}.norm3", d),
        })
    p["dec_norm"] = _ln(wm, "transformer.decoder.norm", d)
    h = cfg.input_h // 32
    w = cfg.input_w // 32
    p["pos"] = position_embedding_sine(h, w, d // 2)
    return p


def _mha(ap, q_in, k_in, v_in, nhead):
    """torch nn.MultiheadAttention semantics with pre-split q/k/v weights."""
    q = nn.linear(q_in, ap["q"]["w"], ap["q"]["b"])
    k = nn.linear(k_in, ap["k"]["w"], ap["k"]["b"])
    v = nn.linear(v_in, ap["v"]["w"], ap["v"]["b"])
    b, nq, d = q.shape
    nk = k.shape[1]
    hd = d // nhead
    qh = q.reshape(b, nq, nhead, hd)
    kh = k.reshape(b, nk, nhead, hd)
    vh = v.reshape(b, nk, nhead, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out.reshape(b, nq, d)
    return nn.linear(out, ap["out"]["w"], ap["out"]["b"])


def apply(params, x, cfg: DETRCfg):
    feat = backbone_apply(params["backbone"], x, cfg.variant,
                          stem_s2d=True)                          # (B,h,w,2048)
    src = nn.conv2d(feat, params["input_proj"]["w"], params["input_proj"]["b"])
    return _transformer_tail(params, src, cfg)


def apply_chain(params, x2, cfg: DETRCfg, ctx, f: int = 1):
    """Int8-resident chain mirror: the ResNet backbone runs chained
    (models/resnet.backbone_chain — conv+add+relu fused epilogues,
    activations cross HBM as int8), the transformer is a float island.
    Mirrors the reference's int8 DETR engine, where the conv backbone is
    the int8 region and attention stays fp16 (detr/README.md:86 int8 rows;
    ops/qchain.py for the formulation). No batch fold (C ≥ 256 everywhere
    in the chained region — lanes are already full)."""
    from tensorrtx_tpu.models.resnet import backbone_chain

    x2 = x2 if x2.shape[-1] == 12 else nn.space_to_depth2(x2)
    feat = backbone_chain(ctx, params["backbone"], x2, cfg.variant)
    src = ctx.conv_out(feat, params["input_proj"]["w"],
                       params["input_proj"]["b"])
    return _transformer_tail(params, src, cfg)


apply_chain.factor = 2
apply_chain.folds = (1,)
apply_chain.supports = lambda cfg: True


def _enc_layer(lp, y, pos, nhead):
    """One post-norm encoder layer (detr.cpp EncoderLayer:262)."""
    qk = y + pos
    y2 = _mha(lp["attn"], qk, qk, y, nhead)
    y = nn.layer_norm(y + y2, lp["n1"]["g"], lp["n1"]["b"], 1e-5)
    y2 = nn.linear(jax.nn.relu(nn.linear(y, lp["l1"]["w"], lp["l1"]["b"])),
                   lp["l2"]["w"], lp["l2"]["b"])
    return nn.layer_norm(y + y2, lp["n2"]["g"], lp["n2"]["b"], 1e-5)


def _transformer_tail(params, src, cfg: DETRCfg):
    b, h, w, d = src.shape
    src = src.reshape(b, h * w, d)
    pos = params["pos"].astype(src.dtype)[None]                  # (1, hw, d)

    y = src
    for lp in params["enc"]:
        y = _enc_layer(lp, y, pos, cfg.nhead)
    return _decoder_tail(params, y, pos, cfg)


def _decoder_tail(params, memory, pos, cfg: DETRCfg):
    b, _, d = memory.shape
    src = memory

    qpos = params["query"].astype(src.dtype)[None]               # (1, nq, d)
    tgt = jnp.zeros((b, cfg.num_queries, d), src.dtype)
    for lp in params["dec"]:
        qk = tgt + qpos
        t2 = _mha(lp["self"], qk, qk, tgt, cfg.nhead)
        tgt = nn.layer_norm(tgt + t2, lp["n1"]["g"], lp["n1"]["b"], 1e-5)
        t2 = _mha(lp["cross"], tgt + qpos, memory + pos, memory, cfg.nhead)
        tgt = nn.layer_norm(tgt + t2, lp["n2"]["g"], lp["n2"]["b"], 1e-5)
        t2 = nn.linear(jax.nn.relu(nn.linear(tgt, lp["l1"]["w"], lp["l1"]["b"])),
                       lp["l2"]["w"], lp["l2"]["b"])
        tgt = nn.layer_norm(tgt + t2, lp["n3"]["g"], lp["n3"]["b"], 1e-5)
    tgt = nn.layer_norm(tgt, params["dec_norm"]["g"], params["dec_norm"]["b"], 1e-5)

    logits = nn.linear(tgt, params["class_embed"]["w"], params["class_embed"]["b"])
    scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bb = jax.nn.relu(nn.linear(tgt, params["bbox0"]["w"], params["bbox0"]["b"]))
    bb = jax.nn.relu(nn.linear(bb, params["bbox1"]["w"], params["bbox1"]["b"]))
    boxes = jax.nn.sigmoid(nn.linear(bb, params["bbox2"]["w"], params["bbox2"]["b"])
                           .astype(jnp.float32))
    return {"scores": scores, "boxes": boxes}


def gpipe_split(params, cfg: DETRCfg, n_stages: int):
    """GPipe stage split (parallel/gpipe.gpipe_serving_step, `cli run
    --pp`): the ResNet backbone + input_proj run replicated (pre), the
    uniform encoder stack pipelines one contiguous layer group per chip,
    the decoder + heads run replicated (post). The sine position embedding
    is a build-time constant closed over by every stage. Numerically
    identical to apply()."""
    if cfg.enc_layers % n_stages:
        raise ValueError(f"detr enc_layers {cfg.enc_layers} not divisible "
                         f"by pp={n_stages}")
    g = cfg.enc_layers // n_stages
    per_stage = [jax.tree.map(lambda *ls: jnp.stack(ls),
                              *params["enc"][s * g:(s + 1) * g])
                 for s in range(n_stages)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *per_stage)
    pos_c = np.asarray(params["pos"])

    def pre(p, x):
        feat = backbone_apply(p["backbone"], x, cfg.variant, stem_s2d=True)
        src = nn.conv2d(feat, p["input_proj"]["w"], p["input_proj"]["b"])
        b, h, w, d = src.shape
        return src.reshape(b, h * w, d)

    def stage_fn(sp, y):
        pos = jnp.asarray(pos_c, y.dtype)[None]

        def body(carry, lp):
            return _enc_layer(lp, carry, pos, cfg.nhead), None

        y, _ = jax.lax.scan(body, y, sp)
        return y

    def post(p, memory):
        pos = jnp.asarray(pos_c, memory.dtype)[None]
        return _decoder_tail(p, memory, pos, cfg)

    return pre, stage_fn, stacked, post


register(ModelDef(
    name="detr",
    build_params=build_params,
    apply=apply,
    apply_chain=apply_chain,
    gpipe_split=gpipe_split,
    default_cfg=DETRCfg,
    input_shape=lambda cfg: ((cfg.input_h // 2, cfg.input_w // 2, 12)
                             if cfg.input_format == "s2d2"
                             else (cfg.input_h, cfg.input_w, 3)),
    doc="DETR r50/r101 set prediction (reference: detr/)",
))
