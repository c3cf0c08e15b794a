"""HRNet-OCR semantic segmentation (object-contextual representations).

Reference: hrnet/hrnet-semantic-segmentation/hrnet_ocr.cpp:23-520 —
HRNetV2 backbone (shared with hrnet-seg) → aux head soft object regions →
class-context gather (softmax over pixels per class × pixel feats) →
object-context attention (f_pixel/f_object similarity × 1/16, softmax over
classes, f_down/f_up) → concat + conv_bn_dropout → cls head → bilinear
upsample → argmax.

TPU-first: the whole OCR head is three einsum matmuls over (N_pixels, C)
maps — pure MXU work, no reshuffling plugins.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.models.hrnet import _cbn, _cbr
from tensorrtx_tpu.models.hrnet_seg import (HRNetSegCfg, _chans,
                                            build_params as seg_build,
                                            _up_bi)
from tensorrtx_tpu.models.hrnet import (_bottleneck_a, _module_a)
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class HRNetOcrCfg(HRNetSegCfg):
    pass


def build_params(wm, cfg: HRNetOcrCfg):
    p = seg_build(wm, cfg)
    # replace hrnet-seg's last_layer with the OCR head stack
    p.pop("last0", None)
    p.pop("last3", None)
    w = cfg.width
    p["aux0"] = _cbn(wm, "aux_head.0", "aux_head.1", 15 * w, 15 * w, 1)
    p["aux3"] = wm.conv2d("aux_head.3", cfg.num_classes, 15 * w, (1, 1))
    p["ocr3x3"] = _cbn(wm, "conv3x3_ocr.0", "conv3x3_ocr.1", 512, 15 * w, 3)
    base = "ocr_distri_head.object_context_block"
    p["f_pixel0"] = _cbn(wm, f"{base}.f_pixel.0", f"{base}.f_pixel.1.0",
                         256, 512, 1)
    p["f_pixel1"] = _cbn(wm, f"{base}.f_pixel.2", f"{base}.f_pixel.3.0",
                         256, 256, 1)
    p["f_object0"] = _cbn(wm, f"{base}.f_object.0", f"{base}.f_object.1.0",
                          256, 512, 1)
    p["f_object1"] = _cbn(wm, f"{base}.f_object.2", f"{base}.f_object.3.0",
                          256, 256, 1)
    p["f_down"] = _cbn(wm, f"{base}.f_down.0", f"{base}.f_down.1.0",
                       256, 512, 1)
    p["f_up"] = _cbn(wm, f"{base}.f_up.0", f"{base}.f_up.1.0", 512, 256, 1)
    p["bn_drop"] = _cbn(wm, "ocr_distri_head.conv_bn_dropout.0",
                        "ocr_distri_head.conv_bn_dropout.1.0", 512, 1024, 1)
    p["cls"] = wm.conv2d("cls_head", cfg.num_classes, 512, (1, 1))
    return p


def apply(params, x, cfg: HRNetOcrCfg):
    """x: (B, H, W, 3) normalized → (B, H, W) int32 class map."""
    # backbone identical to hrnet-seg (hrnet_ocr.cpp shares it)
    y = _cbr(params["c1"], x, stride=2)
    y = _cbr(params["c2"], y, stride=2)
    for bp in params["layer1"]:
        y = _bottleneck_a(bp, y)
    xs = [_cbr(params["trans1"][0], y),
          _cbr(params["trans1"][1], y, stride=2)]
    for si in range(3):
        for mp in params[f"stage{si + 2}"]:
            xs = _module_a(mp, xs, up=_up_bi)
        if si < 2:
            xs = xs + [_cbr(params[f"trans{si + 2}"], xs[-1], stride=2)]
    cat = jnp.concatenate(
        [xs[0]] + [_up_bi(xs[i], 2 ** i) for i in range(1, 4)], axis=-1)

    b, fh, fw, _ = cat.shape
    n = fh * fw
    nc = cfg.num_classes

    # aux head → soft object regions: softmax over PIXELS per class
    aux = _cbr(params["aux0"], cat)
    aux = nn.conv2d(aux, params["aux3"]["w"], params["aux3"]["b"])
    regions = jax.nn.softmax(
        aux.reshape(b, n, nc).astype(jnp.float32), axis=1)   # (B, N, C)

    pixels = _cbr(params["ocr3x3"], cat)  # 3x3, pad k//2 — (B, fh, fw, 512)
    pix_flat = pixels.reshape(b, n, 512).astype(jnp.float32)

    # class context: (B, C, 512) = regionsᵀ · pixels (hrnet_ocr.cpp:384-400)
    context = jnp.einsum("bnc,bnd->bcd", regions, pix_flat)

    def conv1(p, v):  # 1x1 convBnRelu over a (B, T, C) sequence
        y2 = v @ p["w"][0, 0].astype(v.dtype)
        if p["b"] is not None:
            y2 = y2 + p["b"].astype(v.dtype)
        return jax.nn.relu(y2)

    q = conv1(params["f_pixel1"], conv1(params["f_pixel0"], pix_flat))
    k = conv1(params["f_object1"], conv1(params["f_object0"], context))
    v = conv1(params["f_down"], context)                     # (B, C, 256)
    sim = jnp.einsum("bnd,bcd->bnc", q, k) * (1.0 / 16.0)
    sim = jax.nn.softmax(sim, axis=-1)                       # over classes
    ctx_pix = jnp.einsum("bnc,bcd->bnd", sim, v)             # (B, N, 256)
    up = conv1(params["f_up"], ctx_pix)                      # (B, N, 512)

    fused = jnp.concatenate([up.reshape(b, fh, fw, 512),
                             pixels.astype(jnp.float32)], axis=-1)
    fused = _cbr(params["bn_drop"], fused)
    logits = nn.conv2d(fused, params["cls"]["w"], params["cls"]["b"])
    logits = nn.upsample_bilinear(logits.astype(jnp.float32),
                                  (cfg.input_h, cfg.input_w),
                                  align_corners=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


register(ModelDef(
    name="hrnet-ocr",
    build_params=build_params,
    apply=apply,
    default_cfg=HRNetOcrCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="HRNet-OCR segmentation (reference: hrnet-semantic-segmentation/"
        "hrnet_ocr.cpp)",
))
