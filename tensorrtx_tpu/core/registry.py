"""Model registry: name → ModelDef.

The reference's "API" is one CLI binary per model; ours is one registry entry
per model, all served by the same engine/runner (SURVEY.md §7). A ModelDef is
pure data: a param-builder (WeightMap → pytree) and a jit-friendly apply fn.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

__all__ = ["ModelDef", "register", "get_model", "list_models"]

_REGISTRY: Dict[str, "ModelDef"] = {}


@dataclasses.dataclass(frozen=True)
class ModelDef:
    name: str
    build_params: Callable[..., Any]          # (WeightMap, cfg) -> pytree
    apply: Callable[..., Any]                 # (params, x, cfg) -> outputs
    default_cfg: Callable[[], Any]            # () -> cfg dataclass/dict
    input_shape: Callable[[Any], tuple]       # cfg -> (H, W, C)
    postprocess: Optional[Callable[..., Any]] = None  # host-side finishing
    # optional fused-serving fast path: forward from the 2x2 space-to-depth
    # parity tensor emitted by ops.preprocess.letterbox_s2d (same numerics,
    # skips the batch-1 small-channel stride-2 first-conv relayout pathology)
    apply_s2d: Optional[Callable[..., Any]] = None
    # optional GPipe split for uniform-block models (transformer encoders):
    # (params, cfg, n_stages) -> (pre_fn, stage_fn, stacked_stage_params,
    # post_fn) consumed by parallel.gpipe.gpipe_serving_step / cli run --pp
    gpipe_split: Optional[Callable[..., Any]] = None
    # optional int8-RESIDENT chain mirror (ops.qchain): (params, x_s2d, cfg,
    # ctx) -> outputs, same structure in tap and run modes; consumed by
    # core.quant.ChainedInt8Engine. x_s2d matches apply_s2d's input format.
    apply_chain: Optional[Callable[..., Any]] = None
    doc: str = ""


def register(model_def: ModelDef) -> ModelDef:
    _REGISTRY[model_def.name] = model_def
    return model_def


def get_model(name: str) -> ModelDef:
    # Import model modules lazily so `import tensorrtx_tpu` stays fast.
    if name not in _REGISTRY:
        from tensorrtx_tpu import models  # noqa: F401  (triggers registration)

        models.load_all()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_models():
    from tensorrtx_tpu import models

    models.load_all()
    return sorted(_REGISTRY)
