"""LeNet-5 — the reference's "hello world" (lenet/lenet.cpp:36-155, lenet.py).

Graph: conv(6,5x5) → relu → avgpool2 → conv(16,5x5) → relu → avgpool2 →
fc(120) → relu → fc(84) → relu → fc(10) → softmax. Input 1×32×32 grayscale.
Parity target: the digit probabilities printed in
tutorials/getting_started.md:85-105 (match PyTorch to ~1e-4).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class LeNetCfg:
    input_h: int = 32
    input_w: int = 32
    num_classes: int = 10


def build_params(wm, cfg: LeNetCfg):
    return {
        "conv1": wm.conv2d("conv1", 6, 1, (5, 5)),
        "conv2": wm.conv2d("conv2", 16, 6, (5, 5)),
        "fc1": wm.linear("fc1", 120, 16 * 5 * 5),
        "fc2": wm.linear("fc2", 84, 120),
        "fc3": wm.linear("fc3", cfg.num_classes, 84),
    }


def apply(params, x, cfg: LeNetCfg):
    """x: (B, 32, 32, 1) → (B, 10) softmax probabilities."""
    x = nn.conv2d(x, params["conv1"]["w"], params["conv1"]["b"])
    x = jax.nn.relu(x)
    x = nn.avg_pool(x, 2, 2)
    x = nn.conv2d(x, params["conv2"]["w"], params["conv2"]["b"])
    x = jax.nn.relu(x)
    x = nn.avg_pool(x, 2, 2)
    # torch flatten is CHW-major; our activations are NHWC → transpose first.
    b = x.shape[0]
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
    x = jax.nn.relu(nn.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    x = jax.nn.relu(nn.linear(x, params["fc2"]["w"], params["fc2"]["b"]))
    x = nn.linear(x, params["fc3"]["w"], params["fc3"]["b"])
    return jax.nn.softmax(x, axis=-1)


register(ModelDef(
    name="lenet",
    build_params=build_params,
    apply=apply,
    default_cfg=LeNetCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 1),
    doc="LeNet-5 MNIST classifier (reference: lenet/)",
))
