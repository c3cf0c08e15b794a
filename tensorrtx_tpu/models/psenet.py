"""PSENet text detection — TF-slim ResNet50-v1 + FPN + 6 kernel maps with
progressive scale expansion.

Reference: psenet/psenet.cpp:21-179 (createEngine: resnet_v1_50 backbone
with stride on the LAST unit of each block, FPN from pool1/block1/block2/
block4, 4-scale concat at 1/4 res, Conv+BN+ReLU → 1x1 conv → 6 sigmoid
maps), psenet/layers.cpp (bottleneck branch types: 1 = conv shortcut,
0 = identity, 2 = 1x1 maxpool stride-2 shortcut; TF BatchNorm naming
gamma/beta/moving_mean/moving_variance), psenet/psenet.cpp:361-440
(postProcess: threshold 0.9, connected components on the smallest kernel
(channel 0), BFS label expansion through channels 1..5, minAreaRect).

The reference uses a dynamic-shape profile (640..1200); XLA wants static
shapes, so input size is a compile-time cfg (same bucket strategy as the
OCR pipelines). The BFS expansion is host-side numpy, vectorized as
masked label dilation to a fixed point.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BLOCKS = [(64, 3, "block1"), (128, 4, "block2"),
          (256, 6, "block3"), (512, 3, "block4")]


@dataclasses.dataclass
class PsenetCfg:
    input_h: int = 640
    input_w: int = 640
    num_kernels: int = 6
    post_threshold: float = 0.90
    stride: int = 4
    min_area: int = 5


def _conv(wm, name, co, ci, k):
    w = wm.tensor(f"{name}weights", (k, k, ci, co))   # TF HWIO layout
    return {"w": w}


def _conv_bn(wm, name, co, ci, k, eps=1e-5):
    w = wm.tensor(f"{name}weights", (k, k, ci, co))
    g = wm.vec(f"{name}BatchNorm/gamma", co)
    b = wm.vec(f"{name}BatchNorm/beta", co)
    m = wm.vec(f"{name}BatchNorm/moving_mean", co)
    v = wm.vec(f"{name}BatchNorm/moving_variance", co)
    s = g / np.sqrt(v + eps)
    return {"w": w * s[None, None, None, :], "b": b - m * s}


def _bottleneck_p(wm, name, ch, cin, branch):
    p = {"c1": _conv_bn(wm, f"{name}conv1/", ch, cin, 1),
         "c2": _conv_bn(wm, f"{name}conv2/", ch, ch, 3),
         "c3": _conv_bn(wm, f"{name}conv3/", ch * 4, ch, 1)}
    if branch == 1:
        p["sc"] = _conv_bn(wm, f"{name}shortcut/", ch * 4, cin, 1)
    return p


def build_params(wm, cfg: PsenetCfg):
    p = {"conv1": _conv_bn(wm, "resnet_v1_50/conv1/", 64, 3, 7)}
    blocks = []
    cin = 64
    for (ch, n, bname) in BLOCKS:
        units = []
        for u in range(1, n + 1):
            # branch: first unit 1 (conv shortcut); last unit 2 (pool
            # shortcut, stride 2, except block4); middle 0 (identity)
            if u == 1:
                br = 1
            elif u == n and bname != "block4":
                br = 2
            else:
                br = 0
            units.append(_bottleneck_p(
                wm, f"resnet_v1_50/{bname}/unit_{u}/bottleneck_v1/", ch,
                cin, br))
            cin = ch * 4
        blocks.append(units)
    p["blocks"] = blocks
    p["p5"] = _conv(wm, "build_feature_pyramid/build_P5/", 256, 2048, 1)
    p["p4r"] = _conv(wm, "build_feature_pyramid/build_P4/reduce_dimension/",
                     256, 512, 1)
    p["p4a"] = _conv(wm, "build_feature_pyramid/build_P4/avoid_aliasing/",
                     256, 256, 3)
    p["p3r"] = _conv(wm, "build_feature_pyramid/build_P3/reduce_dimension/",
                     256, 256, 1)
    p["p3a"] = _conv(wm, "build_feature_pyramid/build_P3/avoid_aliasing/",
                     256, 256, 3)
    p["p2r"] = _conv(wm, "build_feature_pyramid/build_P2/reduce_dimension/",
                     256, 64, 1)
    p["p2a"] = _conv(wm, "build_feature_pyramid/build_P2/avoid_aliasing/",
                     256, 256, 3)
    p["head0"] = _conv_bn(wm, "feature_results/Conv/", 256, 1024, 3)
    p["head1"] = {"w": wm.tensor("feature_results/Conv_1/weights",
                                 (1, 1, 256, cfg.num_kernels)),
                  "b": wm.vec("feature_results/Conv_1/biases",
                              cfg.num_kernels)}
    return p


def _cbr(cp, x, stride=1):
    k = cp["w"].shape[0]
    y = nn.conv2d(x, cp["w"], cp.get("b"), stride=stride, padding=k // 2)
    return jax.nn.relu(y)


def _cr(cp, x):
    """addConvRelu: conv (no bias, no BN) + relu (layers.cpp)."""
    k = cp["w"].shape[0]
    return jax.nn.relu(nn.conv2d(x, cp["w"], None, padding=k // 2))


def _bottleneck_a(bp, x, stride):
    y = _cbr(bp["c1"], x)
    y = _cbr(bp["c2"], y, stride=stride)
    c3 = bp["c3"]
    y = nn.conv2d(y, c3["w"], c3["b"])
    if "sc" in bp:
        sc = bp["sc"]
        short = nn.conv2d(x, sc["w"], sc["b"], stride=stride)
    elif stride == 2:
        short = nn.max_pool(x, 1, 2)
    else:
        short = x
    return jax.nn.relu(short + y)


def apply(params, x, cfg: PsenetCfg):
    """x: (B, H, W, 3) → (B, H/4, W/4, 6) sigmoid kernel maps."""
    y = _cbr(params["conv1"], x, stride=2)
    # pool1 pads post-only (TF SAME: psenet.cpp:39-41 pre {0,0} post {1,1})
    y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)),
                constant_values=-jnp.inf)
    pool1 = nn.max_pool(y, 3, 2)
    y = pool1
    feats = []
    for bi, units in enumerate(params["blocks"]):
        n = len(units)
        for u, bp in enumerate(units):
            stride = 2 if (u == n - 1 and bi != 3) else 1
            y = _bottleneck_a(bp, y, stride)
        feats.append(y)
    block1, block2, _, block4 = feats
    p5 = _cr(params["p5"], block4)
    p4 = _cr(params["p4a"], _cr(params["p4r"], block2)
             + nn.upsample_nearest(p5))
    p3 = _cr(params["p3a"], _cr(params["p3r"], block1)
             + nn.upsample_nearest(p4))
    p2 = _cr(params["p2a"], _cr(params["p2r"], pool1)
             + nn.upsample_nearest(p3))
    h2 = p2.shape[1]
    cat = jnp.concatenate([
        nn.upsample_bilinear(p5, (h2, p2.shape[2])),
        nn.upsample_bilinear(p4, (h2, p2.shape[2])),
        nn.upsample_bilinear(p3, (h2, p2.shape[2])),
        p2,
    ], -1)
    y = _cbr(params["head0"], cat)
    h1 = params["head1"]
    y = nn.conv2d(y, h1["w"], h1["b"])
    return jax.nn.sigmoid(y.astype(jnp.float32))


def pse_expand(kernels: np.ndarray) -> np.ndarray:
    """Progressive scale expansion (psenet.cpp:361-440). kernels:
    (H, W, 6) binary, channel 0 smallest. Returns int label map."""
    from scipy import ndimage

    labels, _ = ndimage.label(kernels[..., 0], structure=np.array(
        [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
    out = labels.astype(np.int32)
    for c in range(1, kernels.shape[-1]):
        mask = kernels[..., c] > 0
        while True:
            grown = ndimage.grey_dilation(out, footprint=np.array(
                [[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
            new = (out == 0) & mask & (grown > 0)
            if not new.any():
                break
            out[new] = grown[new]
    return out


def postprocess(prob_maps, cfg: PsenetCfg):
    """Sigmoid maps → per-image list of rotated boxes (cx, cy, w, h, angle)
    in map coordinates (× cfg.stride for image coords)."""
    from tensorrtx_tpu.ops.db import min_area_rect

    pm = np.asarray(prob_maps)
    results = []
    for i in range(pm.shape[0]):
        kernels = (pm[i] > cfg.post_threshold).astype(np.uint8)
        labels = pse_expand(kernels)
        boxes = []
        for lab in range(1, labels.max() + 1):
            ys, xs = np.nonzero(labels == lab)
            if len(xs) < cfg.min_area:
                continue
            pts = np.stack([xs, ys], -1).astype(np.float32)
            boxes.append(min_area_rect(pts))
        results.append(boxes)
    return results


register(ModelDef(
    name="psenet",
    build_params=build_params,
    apply=apply,
    default_cfg=PsenetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="PSENet text detection, progressive scale expansion (reference: psenet/)",
))
