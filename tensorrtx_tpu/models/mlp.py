"""Single-layer MLP — the reference's simplest example (mlp/mlp.cpp, mlp.py):
one Linear(1→1) loaded from mlp.wts."""

from __future__ import annotations

import dataclasses

from tensorrtx_tpu.core.registry import ModelDef, register
from tensorrtx_tpu.ops import nn


@dataclasses.dataclass
class MlpCfg:
    in_features: int = 1
    out_features: int = 1


def build_params(wm, cfg: MlpCfg):
    # reference mlp.wts keys: linear.weight, linear.bias
    return {"linear": wm.linear("linear", cfg.out_features, cfg.in_features)}


def apply(params, x, cfg: MlpCfg):
    return nn.linear(x, params["linear"]["w"], params["linear"]["b"])


register(ModelDef(
    name="mlp",
    build_params=build_params,
    apply=apply,
    default_cfg=MlpCfg,
    input_shape=lambda cfg: (1, 1, cfg.in_features),
    doc="1-layer MLP demo (reference: mlp/)",
))
