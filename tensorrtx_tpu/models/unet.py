"""UNet semantic segmentation (reference: unet/unet.cpp — milesial
Pytorch-UNet, bilinear upsampling variant; doubleConv = conv3x3+BN+act ×2,
weight names inc/down{1-4}/up{1-4}/outc with .double_conv.{0,1,3,4}).

Note: the reference inserts TRT LeakyReLU where the source checkpoint was
trained with ReLU (unet.cpp:31); we follow the source (ReLU) since parity is
against the PyTorch model the .wts came from.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


@dataclasses.dataclass
class UNetCfg:
    num_classes: int = 2
    input_h: int = 640
    input_w: int = 960   # reference uses 959; pad to a multiple of 16


def _dc(wm, name, cin, cmid, cout):
    return {
        "c1": wm.conv_bn(f"{name}.double_conv.0", f"{name}.double_conv.1",
                         cmid, cin, (3, 3), eps=BN_EPS),
        "c2": wm.conv_bn(f"{name}.double_conv.3", f"{name}.double_conv.4",
                         cout, cmid, (3, 3), eps=BN_EPS),
    }


def build_params(wm, cfg: UNetCfg):
    return {
        "inc": _dc(wm, "inc", 3, 64, 64),
        "down1": _dc(wm, "down1.maxpool_conv.1", 64, 128, 128),
        "down2": _dc(wm, "down2.maxpool_conv.1", 128, 256, 256),
        "down3": _dc(wm, "down3.maxpool_conv.1", 256, 512, 512),
        "down4": _dc(wm, "down4.maxpool_conv.1", 512, 512, 512),
        "up1": _dc(wm, "up1.conv", 1024, 512, 256),
        "up2": _dc(wm, "up2.conv", 512, 256, 128),
        "up3": _dc(wm, "up3.conv", 256, 128, 64),
        "up4": _dc(wm, "up4.conv", 128, 64, 64),
        "outc": wm.conv2d("outc.conv", cfg.num_classes, 64, (1, 1)),
    }


def _dc_a(p, x):
    x = jax.nn.relu(nn.conv2d(x, p["c1"]["w"], p["c1"]["b"], padding=1))
    return jax.nn.relu(nn.conv2d(x, p["c2"]["w"], p["c2"]["b"], padding=1))


def _dc_s2dh(p, xh):
    """doubleConv evaluated in row-phase space (ops/nn.py conv2d_s2dh)."""
    xh = jax.nn.relu(nn.conv2d_s2dh(
        xh, nn.s2dh_s1_conv_weights(p["c1"]["w"]), p["c1"]["b"]))
    return jax.nn.relu(nn.conv2d_s2dh(
        xh, nn.s2dh_s1_conv_weights(p["c2"]["w"]), p["c2"]["b"]))


def _up(x, skip, p):
    y = nn.upsample_bilinear(x, (skip.shape[1], skip.shape[2]),
                             align_corners=True)
    return _dc_a(p, jnp.concatenate([skip, y], axis=-1))


def apply(params, x, cfg: UNetCfg):
    """Full-res level runs in row-phase space (B, H/2, W, 2C): on v5e the
    NHWC form spent ~35% of the batch-8 iteration relayouting 640×960×64
    tensors between the conv layout and the reduce_window/upsample layout;
    row-phase keeps every op C-minor and doubles conv lanes to 128.
    Numerically identical modulo dot order (same taps, weights, pool and
    interpolation semantics). Reference: unet/unet.cpp builds the same
    graph in NCHW where no such layout conflict exists."""
    if x.shape[1] % 2 or x.shape[2] % 2:
        x1 = _dc_a(params["inc"], x)
        x1_pooled, x1_skip, phase = nn.max_pool(x1, 2, 2), x1, False
    else:
        x1h = _dc_s2dh(params["inc"], nn.space_to_depth_h(x))
        x1_pooled, x1_skip, phase = nn.maxpool2_s2dh(x1h), x1h, True
    x2 = _dc_a(params["down1"], x1_pooled)
    x3 = _dc_a(params["down2"], nn.max_pool(x2, 2, 2))
    x4 = _dc_a(params["down3"], nn.max_pool(x3, 2, 2))
    x5 = _dc_a(params["down4"], nn.max_pool(x4, 2, 2))
    y = _up(x5, x4, params["up1"])
    y = _up(y, x3, params["up2"])
    y = _up(y, x2, params["up3"])
    if not phase:
        y = _up(y, x1_skip, params["up4"])
        return nn.conv2d(y, params["outc"]["w"], params["outc"]["b"])
    yh = nn.upsample_bilinear_to_s2dh(
        y, (2 * x1_skip.shape[1], x1_skip.shape[2]), align_corners=True)
    cs, cy = x1_skip.shape[-1] // 2, yh.shape[-1] // 2
    # segment-aware up4 weights let the concat be a plain channel append
    # (lane-slicing the phase halves apart cost ~8 ms/iter at batch 8)
    cat = jnp.concatenate([x1_skip, yh], axis=-1)
    p4 = params["up4"]
    yh = jax.nn.relu(nn.conv2d_s2dh(
        cat, nn.s2dh_s1_conv_weights(p4["c1"]["w"], in_segments=(cs, cy)),
        p4["c1"]["b"]))
    yh = jax.nn.relu(nn.conv2d_s2dh(
        yh, nn.s2dh_s1_conv_weights(p4["c2"]["w"]), p4["c2"]["b"]))
    # outc (1×1, co = num_classes) as a broadcast multiply-sum: co≈2 fills
    # 2 of 128 MXU lanes, so the dot form ran ~6 TF/s; the VPU form reads
    # yh once and fuses into the preceding conv's epilogue
    b_, h2, w_, c2 = yh.shape
    wf = params["outc"]["w"].reshape(c2 // 2, -1).astype(yh.dtype)
    xr = yh.reshape(b_, h2, w_, 2, c2 // 2)
    outh = (xr[..., None] * wf).sum(axis=-2, dtype=jnp.float32)
    if params["outc"]["b"] is not None:
        outh = outh + params["outc"]["b"].astype(jnp.float32)
    outh = outh.astype(yh.dtype)
    return outh.transpose(0, 1, 3, 2, 4).reshape(b_, 2 * h2, w_, -1)


register(ModelDef(
    name="unet",
    build_params=build_params,
    apply=apply,
    default_cfg=UNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    doc="UNet segmentation (reference: unet/)",
))
