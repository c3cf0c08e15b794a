"""Ultra-Fast-Lane-Detection (reference: ufld/lane_det.cpp — resnet18
backbone (model.*), 1×1 pool conv 512→8, two FC layers → (griding+1, rows,
lanes) logits; row-anchor softmax-expectation postprocess
(lane_det.cpp:223-240 softmax_mul)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn

BN_EPS = 1e-5


@dataclasses.dataclass
class UfldCfg:
    input_h: int = 288
    input_w: int = 800
    griding: int = 100   # output bins per row (engine outputs griding+1)
    rows: int = 56
    lanes: int = 4


def _basic(wm, name, cin, cout, down):
    p = {
        "c1": wm.conv_bn(f"{name}conv1", f"{name}bn1", cout, cin, (3, 3), eps=BN_EPS),
        "c2": wm.conv_bn(f"{name}conv2", f"{name}bn2", cout, cout, (3, 3), eps=BN_EPS),
    }
    if down:
        p["down"] = wm.conv_bn(f"{name}downsample.0", f"{name}downsample.1",
                               cout, cin, (1, 1), eps=BN_EPS)
    return p


def build_params(wm, cfg: UfldCfg):
    p = {"stem": wm.conv_bn("model.conv1", "model.bn1", 64, 3, (7, 7), eps=BN_EPS)}
    chans = [(64, 64), (64, 128), (128, 256), (256, 512)]
    stages = []
    for li, (cin, cout) in enumerate(chans):
        stages.append([_basic(wm, f"model.layer{li + 1}.0.", cin, cout, li > 0),
                       _basic(wm, f"model.layer{li + 1}.1.", cout, cout, False)])
    p["stages"] = stages
    p["pool"] = wm.conv2d("pool", 8, 512, (1, 1))
    fm = 8 * (cfg.input_h // 32) * (cfg.input_w // 32)
    out = (cfg.griding + 1) * cfg.rows * cfg.lanes
    p["cls0"] = wm.linear("cls.0", 2048, fm)
    p["cls2"] = wm.linear("cls.2", out, 2048)
    return p


def apply(params, x, cfg: UfldCfg):
    y = jax.nn.relu(nn.conv2d(x, params["stem"]["w"], params["stem"]["b"],
                              stride=2, padding=3))
    y = nn.max_pool(y, 3, 2, 1)
    for li, blocks in enumerate(params["stages"]):
        stride = 1 if li == 0 else 2
        for bi, bp in enumerate(blocks):
            s = stride if bi == 0 else 1
            z = jax.nn.relu(nn.conv2d(y, bp["c1"]["w"], bp["c1"]["b"],
                                      stride=s, padding=1))
            z = nn.conv2d(z, bp["c2"]["w"], bp["c2"]["b"], padding=1)
            sc = y if "down" not in bp else nn.conv2d(y, bp["down"]["w"],
                                                      bp["down"]["b"], stride=s)
            y = jax.nn.relu(z + sc)
    y = nn.conv2d(y, params["pool"]["w"], params["pool"]["b"])
    b = y.shape[0]
    y = jnp.transpose(y, (0, 3, 1, 2)).reshape(b, -1)
    y = jax.nn.relu(nn.linear(y, params["cls0"]["w"], params["cls0"]["b"]))
    y = nn.linear(y, params["cls2"]["w"], params["cls2"]["b"])
    return y.reshape(b, cfg.griding + 1, cfg.rows, cfg.lanes)


def postprocess(logits, cfg: UfldCfg):
    """Row-anchor decode: softmax over grid bins (excl. the last no-lane bin)
    → expected column index; last-bin argmax means no lane
    (lane_det.cpp:223-240)."""
    lg = np.asarray(logits)
    prob = np.exp(lg[:, :-1] - lg[:, :-1].max(axis=1, keepdims=True))
    prob = prob / prob.sum(axis=1, keepdims=True)
    idx = np.arange(1, cfg.griding + 1, dtype=np.float32)[None, :, None, None]
    loc = (prob * idx).sum(axis=1)
    no_lane = lg.argmax(axis=1) == cfg.griding
    loc[no_lane] = 0.0
    return loc  # (B, rows, lanes) expected grid position, 0 = no lane


register(ModelDef(
    name="ufld",
    build_params=build_params,
    apply=apply,
    default_cfg=UfldCfg,
    input_shape=lambda cfg: (cfg.input_h, cfg.input_w, 3),
    postprocess=postprocess,
    doc="Ultra-Fast-Lane-Detection (reference: ufld/)",
))
