"""EfficientAD-M anomaly detection (reference: efficient_ad/src/model.cpp:
teacher + student PDN-medium nets + autoencoder in ONE graph; anomaly map =
0.5·(normalized teacher-student distance + normalized student-AE distance),
quantile-normalized (quantiles.qa_st/qb_st/qa_ae/qb_ae) with teacher feature
standardization (mean_std.mean/std). Input 256×256, map interpolated back to
input size)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class EfficientAdCfg:
    input_h: int = 256
    input_w: int = 256
    out_channels: int = 384


def _conv(wm, name, co, ci, k):
    return wm.conv2d(name, co, ci, (k, k))


def _pdn(wm, prefix, c5, c6):
    return {
        "c1": _conv(wm, f"{prefix}.conv1", 256, 3, 4),
        "c2": _conv(wm, f"{prefix}.conv2", 512, 256, 4),
        "c3": _conv(wm, f"{prefix}.conv3", 512, 512, 1),
        "c4": _conv(wm, f"{prefix}.conv4", 512, 512, 3),
        "c5": _conv(wm, f"{prefix}.conv5", c5, 512, 4),
        "c6": _conv(wm, f"{prefix}.conv6", c6, c5, 1),
    }


def build_params(wm, cfg: EfficientAdCfg):
    p = {
        "teacher": _pdn(wm, "teacher", 384, 384),
        "student": _pdn(wm, "student", 768, 768),
        "mean": wm.vec("mean_std.mean", cfg.out_channels),
        "std": wm.vec("mean_std.std", cfg.out_channels),
        "qa_st": wm.vec("quantiles.qa_st", 1),
        "qb_st": wm.vec("quantiles.qb_st", 1),
        "qa_ae": wm.vec("quantiles.qa_ae", 1),
        "qb_ae": wm.vec("quantiles.qb_ae", 1),
        "enc": [
            _conv(wm, "ae.encoder.enconv1", 32, 3, 4),
            _conv(wm, "ae.encoder.enconv2", 32, 32, 4),
            _conv(wm, "ae.encoder.enconv3", 64, 32, 4),
            _conv(wm, "ae.encoder.enconv4", 64, 64, 4),
            _conv(wm, "ae.encoder.enconv5", 64, 64, 4),
            _conv(wm, "ae.encoder.enconv6", 64, 64, 8),
        ],
        "dec": [_conv(wm, f"ae.decoder.deconv{i}", 64, 64, 4) for i in range(1, 7)]
               + [_conv(wm, "ae.decoder.deconv7", 64, 64, 3),
                  _conv(wm, "ae.decoder.deconv8", cfg.out_channels, 64, 3)],
    }
    return p


def _pdn_a(p, x):
    r = jax.nn.relu
    y = r(nn.conv2d(x, p["c1"]["w"], p["c1"]["b"]))
    y = nn.avg_pool(y, 2, 2)
    y = r(nn.conv2d(y, p["c2"]["w"], p["c2"]["b"]))
    y = nn.avg_pool(y, 2, 2)
    y = r(nn.conv2d(y, p["c3"]["w"], p["c3"]["b"]))
    y = r(nn.conv2d(y, p["c4"]["w"], p["c4"]["b"]))
    y = r(nn.conv2d(y, p["c5"]["w"], p["c5"]["b"]))
    return nn.conv2d(y, p["c6"]["w"], p["c6"]["b"])


def apply(params, x, cfg: EfficientAdCfg):
    """x: (B, 256, 256, 3) → anomaly map (B, 256, 256, 1)."""
    r = jax.nn.relu
    t = _pdn_a(params["teacher"], x)                         # (B, h, w, 384)
    s = _pdn_a(params["student"], x)                         # (B, h, w, 768)
    t = (t - params["mean"].astype(t.dtype)) / params["std"].astype(t.dtype)

    # autoencoder
    y = x
    for i, cp in enumerate(params["enc"]):
        stride = 2 if i < 5 else 1
        pad = 1 if i < 5 else 0
        y = nn.conv2d(y, cp["w"], cp["b"], stride=stride, padding=pad)
        if i < 5:
            y = r(y)
    sizes = [3, 8, 15, 32, 63, 127, 56]
    for i, cp in enumerate(params["dec"][:7]):
        y = nn.upsample_bilinear(y, (sizes[i], sizes[i]))
        k = cp["w"].shape[0]
        y = r(nn.conv2d(y, cp["w"], cp["b"], padding=2 if k == 4 else 1))
    ae = nn.conv2d(y, params["dec"][7]["w"], params["dec"][7]["b"], padding=1)

    st_half = s[..., :cfg.out_channels]
    ae_half = s[..., cfg.out_channels:]
    map_st = jnp.mean(jnp.square(t - st_half), axis=-1, keepdims=True)
    map_ae = jnp.mean(jnp.square(ae - ae_half), axis=-1, keepdims=True)
    # pad 4 each side, bilinear-resize to input (model.cpp:383-398)
    map_st = jnp.pad(map_st, ((0, 0), (4, 4), (4, 4), (0, 0)))
    map_ae = jnp.pad(map_ae, ((0, 0), (4, 4), (4, 4), (0, 0)))
    map_st = nn.upsample_bilinear(map_st, (cfg.input_h, cfg.input_w))
    map_ae = nn.upsample_bilinear(map_ae, (cfg.input_h, cfg.input_w))
    qa_st, qb_st = params["qa_st"][0], params["qb_st"][0]
    qa_ae, qb_ae = params["qa_ae"][0], params["qb_ae"][0]
    map_st = 0.1 * (map_st - qa_st) / (qb_st - qa_st)
    map_ae = 0.1 * (map_ae - qa_ae) / (qb_ae - qa_ae)
    return 0.5 * map_st + 0.5 * map_ae


register(ModelDef(
    name="efficient_ad",
    build_params=build_params,
    apply=apply,
    default_cfg=EfficientAdCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="EfficientAD-M anomaly detection (reference: efficient_ad/)",
))
