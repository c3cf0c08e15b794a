"""Numeric parity: hrnet-seg (full torch HRNetV2-seg graph) and psenet
(torch-functional oracle over the same TF-named random weights)."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.hrnet_seg_torch import HRNetSegTorch
from torch_refs.yolo11_torch import randomize


def test_hrnet_seg_parity(tmp_path, rng):
    tm = randomize(HRNetSegTorch(width=18, num_classes=19), seed=71).eval()
    wts = tmp_path / "hrseg.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("hrnet-seg", str(wts), width=18, input_h=128,
                       input_w=256)
    x = rng.uniform(-1, 1, (1, 3, 128, 256)).astype(np.float32)
    with torch.no_grad():
        logits = tm(torch.from_numpy(x))
        exp_map = logits.argmax(1).numpy().astype(np.int32)
    got_map = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    # argmax maps must agree except at rare fp ties in the bilinear resize
    assert (got_map == exp_map).mean() > 0.999


def _psenet_torch_oracle(W, x, num_kernels=6):
    """Torch-functional PSENet (TF-slim resnet50-v1 semantics) over the
    same named weights the engine consumed (psenet/psenet.cpp:21-179)."""
    t = lambda k: torch.from_numpy(np.asarray(W[k], np.float32))

    def conv_bn(x, name, stride=1):
        w = t(f"{name}weights").permute(3, 2, 0, 1)     # HWIO → OIHW
        y = F.conv2d(x, w, None, stride, w.shape[-1] // 2)
        return F.batch_norm(y, t(f"{name}BatchNorm/moving_mean"),
                            t(f"{name}BatchNorm/moving_variance"),
                            t(f"{name}BatchNorm/gamma"),
                            t(f"{name}BatchNorm/beta"), eps=1e-5)

    def conv_relu(x, name):
        w = t(f"{name}weights").permute(3, 2, 0, 1)
        return F.relu(F.conv2d(x, w, None, 1, w.shape[-1] // 2))

    def bottleneck(x, name, ch, stride, branch):
        y = F.relu(conv_bn(x, f"{name}conv1/"))
        y = F.relu(conv_bn(y, f"{name}conv2/", stride=stride))
        y = conv_bn(y, f"{name}conv3/")
        if branch == 1:
            sc = conv_bn(x, f"{name}shortcut/", stride=stride)
        elif stride == 2:
            sc = F.max_pool2d(x, 1, 2)
        else:
            sc = x
        return F.relu(sc + y)

    y = F.relu(conv_bn(x, "resnet_v1_50/conv1/", stride=2))
    y = F.pad(y, (0, 1, 0, 1), value=float("-inf"))
    pool1 = F.max_pool2d(y, 3, 2)
    y = pool1
    feats = []
    blocks = [(64, 3, "block1"), (128, 4, "block2"),
              (256, 6, "block3"), (512, 3, "block4")]
    for bi, (ch, n, bname) in enumerate(blocks):
        for u in range(1, n + 1):
            br = 1 if u == 1 else (2 if (u == n and bname != "block4") else 0)
            stride = 2 if (u == n and bi != 3) else 1
            y = bottleneck(y, f"resnet_v1_50/{bname}/unit_{u}/bottleneck_v1/",
                           ch, stride, br)
        feats.append(y)
    block1, block2, _, block4 = feats
    up2 = lambda v: F.interpolate(v, scale_factor=2, mode="nearest")
    p5 = conv_relu(block4, "build_feature_pyramid/build_P5/")
    p4 = conv_relu(conv_relu(
        block2, "build_feature_pyramid/build_P4/reduce_dimension/") + up2(p5),
        "build_feature_pyramid/build_P4/avoid_aliasing/")
    p3 = conv_relu(conv_relu(
        block1, "build_feature_pyramid/build_P3/reduce_dimension/") + up2(p4),
        "build_feature_pyramid/build_P3/avoid_aliasing/")
    p2 = conv_relu(conv_relu(
        pool1, "build_feature_pyramid/build_P2/reduce_dimension/") + up2(p3),
        "build_feature_pyramid/build_P2/avoid_aliasing/")
    size = p2.shape[-2:]
    ub = lambda v: F.interpolate(v, size=size, mode="bilinear",
                                 align_corners=False)
    cat = torch.cat([ub(p5), ub(p4), ub(p3), p2], 1)
    y = F.relu(conv_bn(cat, "feature_results/Conv/"))
    w = t("feature_results/Conv_1/weights").permute(3, 2, 0, 1)
    y = F.conv2d(y, w, t("feature_results/Conv_1/biases"))
    return torch.sigmoid(y)


def test_psenet_parity(rng):
    model = get_model("psenet")
    cfg = dataclasses.replace(model.default_cfg(), input_h=192, input_w=192)
    wm = RandomWeightMap(seed=72)
    params = model.build_params(wm, cfg)
    x = rng.uniform(-1, 1, (1, 192, 192, 3)).astype(np.float32)
    got = np.asarray(jax.jit(
        lambda p, v: model.apply(p, v, cfg))(
        jax.tree.map(jnp.asarray, params), x))
    with torch.no_grad():
        exp = _psenet_torch_oracle(
            wm.raw, torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp, atol=2e-3)
