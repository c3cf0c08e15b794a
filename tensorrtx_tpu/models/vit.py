"""ViT-B/16 classifier (reference: vit/vit.cc:114-250 — patch-embed conv,
cls token + position embeddings, 12 pre-LN transformer blocks with fused SDPA,
GELU_ERF MLPs, final LN, linear classifier; LN eps 1e-12).

Weights follow the HuggingFace ViT state_dict the reference consumes
(vit.embeddings.*, vit.encoder.layer.N.*, vit.layernorm, classifier).

TPU design: SDPA as batched einsum on the MXU; whole network is one fused
program (the reference needs TRT's addAttention fast path for this).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

LN_EPS = 1e-12


@dataclasses.dataclass
class ViTCfg:
    hidden: int = 768
    heads: int = 12
    layers: int = 12
    mlp: int = 3072
    patch: int = 16
    num_classes: int = 1000
    input_h: int = 224
    input_w: int = 224


def _lin(wm, name, out_f, in_f):
    return {"w": wm.tensor(f"{name}.weight", (out_f, in_f)).T.copy(),
            "b": wm.vec(f"{name}.bias", out_f)}


def _ln(wm, name, d):
    return {"g": wm.vec(f"{name}.weight", d), "b": wm.vec(f"{name}.bias", d)}


def build_params(wm, cfg: ViTCfg):
    d = cfg.hidden
    proj_w = wm.tensor("vit.embeddings.patch_embeddings.projection.weight",
                       (d, 3, cfg.patch, cfg.patch))
    p = {
        "patch_w": np.transpose(proj_w, (2, 3, 1, 0)),
        "patch_b": wm.vec("vit.embeddings.patch_embeddings.projection.bias", d),
        "cls": wm.tensor("vit.embeddings.cls_token", (1, 1, d)),
        "pos": wm.tensor("vit.embeddings.position_embeddings",
                         (1, (cfg.input_h // cfg.patch) * (cfg.input_w // cfg.patch) + 1, d)),
        "final_ln": _ln(wm, "vit.layernorm", d),
        "head": _lin(wm, "classifier", cfg.num_classes, d),
        "blocks": [],
    }
    for i in range(cfg.layers):
        pre = f"vit.encoder.layer.{i}"
        p["blocks"].append({
            "ln1": _ln(wm, f"{pre}.layernorm_before", d),
            "q": _lin(wm, f"{pre}.attention.attention.query", d, d),
            "k": _lin(wm, f"{pre}.attention.attention.key", d, d),
            "v": _lin(wm, f"{pre}.attention.attention.value", d, d),
            "proj": _lin(wm, f"{pre}.attention.output.dense", d, d),
            "ln2": _ln(wm, f"{pre}.layernorm_after", d),
            "fc1": _lin(wm, f"{pre}.intermediate.dense", cfg.mlp, d),
            "fc2": _lin(wm, f"{pre}.output.dense", d, cfg.mlp),
        })
    return p


def sdpa(q, k, v, heads):
    """Scaled dot-product attention via einsum (the TRT addAttention analog,
    vit.cc:192)."""
    b, n, d = q.shape
    hd = d // heads
    qh = q.reshape(b, n, heads, hd)
    kh = k.reshape(b, n, heads, hd)
    vh = v.reshape(b, n, heads, hd)
    attn = jnp.einsum("bnhd,bmhd->bhnm", qh, kh,
                      preferred_element_type=jnp.float32) * (hd ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, n, d)


def apply(params, x, cfg: ViTCfg):
    """x: (B, H, W, 3) → (B, num_classes) logits."""
    y = nn.conv2d(x, params["patch_w"], params["patch_b"],
                  stride=cfg.patch)                       # (B, H/16, W/16, d)
    b = y.shape[0]
    y = y.reshape(b, -1, cfg.hidden)
    cls = jnp.broadcast_to(params["cls"].astype(y.dtype), (b, 1, cfg.hidden))
    y = jnp.concatenate([cls, y], axis=1) + params["pos"].astype(y.dtype)
    for blk in params["blocks"]:
        y = block_a(blk, y, cfg.heads)
    y = nn.layer_norm(y, params["final_ln"]["g"], params["final_ln"]["b"], LN_EPS)
    return nn.linear(y[:, 0], params["head"]["w"], params["head"]["b"])


def block_a(blk, y, heads):
    """One pre-LN encoder block (identical in/out shape — also the stage
    function for GPipe pipelining, parallel/gpipe.py)."""
    h = nn.layer_norm(y, blk["ln1"]["g"], blk["ln1"]["b"], LN_EPS)
    q = nn.linear(h, blk["q"]["w"], blk["q"]["b"])
    k = nn.linear(h, blk["k"]["w"], blk["k"]["b"])
    v = nn.linear(h, blk["v"]["w"], blk["v"]["b"])
    a = sdpa(q, k, v, heads)
    y = y + nn.linear(a, blk["proj"]["w"], blk["proj"]["b"])
    h = nn.layer_norm(y, blk["ln2"]["g"], blk["ln2"]["b"], LN_EPS)
    h = nn.gelu_erf(nn.linear(h, blk["fc1"]["w"], blk["fc1"]["b"]))
    return y + nn.linear(h, blk["fc2"]["w"], blk["fc2"]["b"])


def gpipe_split(params, cfg: "ViTCfg", n_stages: int):
    """Split the encoder stack into n_stages GPipe stages
    (parallel/gpipe.gpipe_apply): patch embed runs replicated (pre),
    each stage scans its contiguous group of blocks, final LN + head run
    replicated (post). Numerically identical to apply()."""
    depth = len(params["blocks"])
    if depth % n_stages:
        raise ValueError(f"vit depth {depth} not divisible by pp={n_stages}")
    g = depth // n_stages
    blocks = params["blocks"]
    per_stage = [jax.tree.map(lambda *bs: jnp.stack(bs),
                              *blocks[s * g:(s + 1) * g])
                 for s in range(n_stages)]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *per_stage)

    def pre(p, x):
        y = nn.conv2d(x, p["patch_w"], p["patch_b"], stride=cfg.patch)
        b = y.shape[0]
        y = y.reshape(b, -1, cfg.hidden)
        cls = jnp.broadcast_to(p["cls"].astype(y.dtype), (b, 1, cfg.hidden))
        return jnp.concatenate([cls, y], axis=1) + p["pos"].astype(y.dtype)

    def stage_fn(sp, y):
        def body(carry, blk):
            return block_a(blk, carry, cfg.heads), None
        y, _ = jax.lax.scan(body, y, sp)
        return y

    def post(p, y):
        y = nn.layer_norm(y, p["final_ln"]["g"], p["final_ln"]["b"], LN_EPS)
        return nn.linear(y[:, 0], p["head"]["w"], p["head"]["b"])

    return pre, stage_fn, stacked, post


register(ModelDef(
    name="vit",
    build_params=build_params,
    apply=apply,
    default_cfg=ViTCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    gpipe_split=gpipe_split,
    doc="ViT-B/16 classifier (reference: vit/)",
))
