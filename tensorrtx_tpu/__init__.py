"""tensorrtx_tpu — a TPU-native inference framework with the capabilities of
wang-xinyu/tensorrtx: hand-built model graphs loaded from `.wts` weight dumps,
compiled ahead of time as JAX/XLA programs with Pallas kernels for the hot
decode/NMS/preprocess paths.
"""

from tensorrtx_tpu.core.engine import Engine, build_engine, load_engine
from tensorrtx_tpu.core.registry import get_model, list_models
from tensorrtx_tpu.core.wts import load_wts, save_wts

__version__ = "0.1.0"

__all__ = [
    "Engine", "build_engine", "load_engine",
    "get_model", "list_models", "load_wts", "save_wts",
]
