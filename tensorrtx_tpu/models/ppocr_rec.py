"""PP-OCRv5 mobile text recognition (PPLCNetV3 + SVTR encoder + CTC head).

Reference: ppocrv5/src/model.cpp:1678-1795 (buildPPOCRv5MobileRec) +
src/block.cpp helpers (learnableRepLayer :357, seLayer :391, convBnSwish
:274, addSvtrAttention :496, addSvtrBlock :529, addLinear :904).
Paddle naming: conv {n}.w_0/.b_0, BN {n}.w_0(γ).b_0(β).w_1(μ).w_2(σ²),
linear {n}.w_0 is (in, out) (x @ W + b), layer_norm {n}.w_0/.b_0.

TPU design notes vs the reference:
- The reference uses a TRT dynamic-width optimization profile
  (W ∈ [160, 3200], H = 48 fixed, config.h:23-26). XLA wants static
  shapes, so width is a compile-time config; serving picks a bucket via
  ops.ocr_preprocess.rec_width_bucket and right-pads — same strategy,
  resolved at trace time instead of runtime.
- The fused qkv linear is kept fused: one (120, 360) matmul on the MXU,
  then split; the reference slices the weight into three matmuls
  (block.cpp:956-969) only because TRT lacks a cheap split.
- Softmax over 18k classes + argmax is fused under jit; the CTC greedy
  collapse runs on host (ops/ctc.py), mirroring postprocess.cpp.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.ppocr_det import _affine, _bn, _conv, _hswish, _se
from tensorrtx_tpu.ops import nn

# (conv_name, affine_idx, out, k, (sh, sw), depthwise, se(squeeze, c0, c1))
# model.cpp:1689-1755; every rec rep layer has withAct=true.
_BACKBONE = [
    ("conv2d_136", 0, 16, 3, (1, 1), True, None),
    ("conv2d_137", 2, 32, 1, (1, 1), False, None),
    ("conv2d_138", 4, 32, 3, (1, 1), True, None),
    ("conv2d_139", 6, 64, 1, (1, 1), False, None),
    ("conv2d_140", 8, 64, 3, (1, 1), True, None),
    ("conv2d_141", 10, 64, 1, (1, 1), False, None),
    ("conv2d_142", 12, 64, 3, (2, 1), True, None),
    ("conv2d_143", 14, 128, 1, (1, 1), False, None),
    ("conv2d_144", 16, 128, 3, (1, 1), True, None),
    ("conv2d_145", 18, 128, 1, (1, 1), False, None),
    ("conv2d_146", 20, 128, 3, (1, 2), True, None),
    ("conv2d_147", 22, 240, 1, (1, 1), False, None),
    ("conv2d_148", 24, 240, 5, (1, 1), True, None),
    ("conv2d_149", 26, 240, 1, (1, 1), False, None),
    ("conv2d_150", 28, 240, 5, (1, 1), True, None),
    ("conv2d_151", 30, 240, 1, (1, 1), False, None),
    ("conv2d_152", 32, 240, 5, (1, 1), True, None),
    ("conv2d_153", 34, 240, 1, (1, 1), False, None),
    ("conv2d_154", 36, 240, 5, (1, 1), True, None),
    ("conv2d_155", 38, 240, 1, (1, 1), False, None),
    ("conv2d_156", 40, 240, 5, (2, 1), True, (60, "conv2d_96", "conv2d_97")),
    ("conv2d_157", 42, 480, 1, (1, 1), False, None),
    ("conv2d_158", 44, 480, 5, (1, 1), True,
     (120, "conv2d_107", "conv2d_108")),
    ("conv2d_159", 46, 480, 1, (1, 1), False, None),
    ("conv2d_160", 48, 480, 5, (2, 1), True, None),
    ("conv2d_161", 50, 480, 1, (1, 1), False, None),
    ("conv2d_162", 52, 480, 5, (1, 1), True, None),
    ("conv2d_163", 54, 480, 1, (1, 1), False, None),
]

# SVTR encoder: 2 blocks, dim 120, 8 heads × 15 (block.cpp:496-543)
_SVTR = [("layer_norm_0", "linear_0", "linear_1", "layer_norm_1",
          "linear_2", "linear_3"),
         ("layer_norm_2", "linear_4", "linear_5", "layer_norm_3",
          "linear_6", "linear_7")]
_DIM, _HEADS, _HEAD_DIM = 120, 8, 15


@dataclasses.dataclass
class PpocrRecCfg:
    num_classes: int = 18385   # kRecClassCount, config.h:27
    input_h: int = 48          # kRecInputH
    input_w: int = 320         # kRecOptW; any multiple of 8 ≥ 40 works


def _linear(wm, name, ci, co):
    return {"w": wm.tensor(f"{name}.w_0", (ci, co)),
            "b": wm.vec(f"{name}.b_0", co)}


def _ln(wm, name, ch):
    return {"g": wm.vec(f"{name}.w_0", ch), "b": wm.vec(f"{name}.b_0", ch)}


def _conv_bn(wm, cname, bname, co, ci, kh, kw):
    w = wm.tensor(f"{cname}.w_0", (co, ci, kh, kw))
    return {"w": np.transpose(w, (2, 3, 1, 0)), "bn": _bn(wm, bname, co)}


def build_params(wm, cfg: PpocrRecCfg):
    p = {"stem": _conv(wm, "conv2d_0", 16, 3, 3, bias=False),
         "stem_bn": _bn(wm, "batch_norm2d_0", 16),
         "backbone": []}
    cin = 16
    for (name, aff, co, k, s, dw, se) in _BACKBONE:
        bp = {"conv": _conv(wm, name, co, cin, k, cin if dw else 1),
              "a0": _affine(wm, aff), "a1": _affine(wm, aff + 1)}
        if se is not None:
            sq, c0, c1 = se
            bp["se_r"] = _conv(wm, c0, sq, co, 1)
            bp["se_e"] = _conv(wm, c1, co, sq, 1)
        p["backbone"].append(bp)
        cin = co
    p["enc0"] = _conv_bn(wm, "conv2d_131", "batch_norm2d_146", 60, 480, 1, 3)
    p["enc1"] = _conv_bn(wm, "conv2d_132", "batch_norm2d_147", 120, 60, 1, 1)
    p["svtr"] = []
    for (ln0, qkv, proj, ln1, m0, m1) in _SVTR:
        p["svtr"].append({"ln0": _ln(wm, ln0, _DIM),
                          "qkv": _linear(wm, qkv, _DIM, 3 * _DIM),
                          "proj": _linear(wm, proj, _DIM, _DIM),
                          "ln1": _ln(wm, ln1, _DIM),
                          "mlp0": _linear(wm, m0, _DIM, 2 * _DIM),
                          "mlp1": _linear(wm, m1, 2 * _DIM, _DIM)})
    p["svtr_ln"] = _ln(wm, "layer_norm_4", _DIM)
    p["enc2"] = _conv_bn(wm, "conv2d_133", "batch_norm2d_148", 480, 120, 1, 1)
    p["enc3"] = _conv_bn(wm, "conv2d_134", "batch_norm2d_149", 60, 960, 1, 3)
    p["enc4"] = _conv_bn(wm, "conv2d_135", "batch_norm2d_150", 120, 60, 1, 1)
    p["head"] = _linear(wm, "linear_8", _DIM, cfg.num_classes)
    return p


def _rep(bp, x, k, s):
    """LearnableRepLayer (block.cpp:357-381): conv+bias → scalar affine →
    hardswish → scalar affine, then SE on the completed layer."""
    dw = bp["conv"]["w"].shape[2] == 1 and x.shape[-1] > 3
    groups = x.shape[-1] if dw else 1
    y = nn.conv2d(x, bp["conv"]["w"], bp["conv"]["b"], stride=s,
                  padding=k // 2, groups=groups)
    y = y * bp["a0"]["s"].astype(y.dtype) + bp["a0"]["b"].astype(y.dtype)
    y = _hswish(y)
    y = y * bp["a1"]["s"].astype(y.dtype) + bp["a1"]["b"].astype(y.dtype)
    if "se_r" in bp:
        y = _se(y, bp["se_r"], bp["se_e"], 1.0 / 6.0)
    return y


def _conv_bn_swish(cp, x, pad=(0, 0)):
    y = nn.conv2d(x, cp["w"], None, padding=pad)
    bn = cp["bn"]
    y = y * bn["s"].astype(y.dtype) + bn["b"].astype(y.dtype)
    return nn.silu(y)


def _layer_norm(lp, x, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * lp["g"].astype(x.dtype) + lp["b"].astype(x.dtype)


def _svtr_block(sp, x):
    b, t, _ = x.shape
    h = _layer_norm(sp["ln0"], x)
    qkv = h @ sp["qkv"]["w"].astype(h.dtype) + sp["qkv"]["b"].astype(h.dtype)
    q, k, v = [qkv[..., i * _DIM:(i + 1) * _DIM]
               .reshape(b, t, _HEADS, _HEAD_DIM).transpose(0, 2, 1, 3)
               for i in range(3)]
    attn = jax.nn.softmax(
        (q / np.sqrt(_HEAD_DIM)) @ k.transpose(0, 1, 3, 2), axis=-1)
    ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, _DIM)
    ctx = ctx @ sp["proj"]["w"].astype(h.dtype) + sp["proj"]["b"].astype(h.dtype)
    x = x + ctx
    h = _layer_norm(sp["ln1"], x)
    h = h @ sp["mlp0"]["w"].astype(h.dtype) + sp["mlp0"]["b"].astype(h.dtype)
    h = nn.silu(h)
    h = h @ sp["mlp1"]["w"].astype(h.dtype) + sp["mlp1"]["b"].astype(h.dtype)
    return x + h


def apply(params, x, cfg: PpocrRecCfg):
    """x: (B, 48, W, 3) normalized (x/255-0.5)/0.5 → (B, W/8, num_classes)
    per-timestep CTC probabilities (softmax over classes)."""
    y = nn.conv2d(x, params["stem"]["w"], None, stride=2, padding=1)
    sb = params["stem_bn"]
    y = y * sb["s"].astype(y.dtype) + sb["b"].astype(y.dtype)
    for (spec, bp) in zip(_BACKBONE, params["backbone"]):
        _, _, _, k, s, _, _ = spec
        y = _rep(bp, y, k, s)
    # backbone avgpool k(3,2) s(3,2): (B, 3, W/4, 480) → (B, 1, W/8, 480)
    backbone = nn.avg_pool(y, (3, 2), (3, 2))
    h = _conv_bn_swish(params["enc0"], backbone, pad=(0, 1))
    h = _conv_bn_swish(params["enc1"], h)
    b, _, t, _ = h.shape
    seq = h.reshape(b, t, _DIM)
    for sp in params["svtr"]:
        seq = _svtr_block(sp, seq)
    seq = _layer_norm(params["svtr_ln"], seq, eps=1e-6)
    h = seq.reshape(b, 1, t, _DIM)
    h = _conv_bn_swish(params["enc2"], h)
    h = jnp.concatenate([backbone, h], axis=-1)
    h = _conv_bn_swish(params["enc3"], h, pad=(0, 1))
    h = _conv_bn_swish(params["enc4"], h)
    seq = h.reshape(b, t, _DIM)
    logits = (seq @ params["head"]["w"].astype(seq.dtype)
              + params["head"]["b"].astype(seq.dtype))
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def postprocess(probs, cfg: PpocrRecCfg):
    """CTC greedy collapse (blank=0), per batch item → [(ids, confs)]."""
    from tensorrtx_tpu.ops.ctc import ctc_greedy_decode

    pm = np.asarray(probs)
    ids = pm.argmax(-1)
    return [ctc_greedy_decode(ids[i], pm[i].max(-1)) for i in range(len(pm))]


register(ModelDef(
    name="ppocrv5_rec",
    build_params=build_params,
    apply=apply,
    default_cfg=PpocrRecCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="PP-OCRv5 mobile text recognition (reference: ppocrv5/)",
))
