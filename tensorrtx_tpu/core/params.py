"""Weight-map → structured parameter pytrees.

The reference keeps weights as a flat ``map<string, Weights>`` and each graph
builder reshapes them at layer-insertion time (yolo11/src/block.cpp:10-38).
We do the same, but additionally:

- transpose conv kernels from torch OIHW to TPU-friendly HWIO,
- fold BatchNorm into the preceding conv's scale/bias at *build* time
  (the reference folds BN into a TensorRT IScaleLayer at build time too,
  yolo11/src/block.cpp:40-72 — we go one step further and fold into the conv),
- cast to the target compute dtype (fp32 / bf16 / fp16).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["WeightMap", "ConvParams", "resolve_dtype"]


def resolve_dtype(precision: str):
    import jax.numpy as jnp

    p = precision.lower()
    if p in ("fp32", "float32", "f32"):
        return jnp.float32
    if p in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if p in ("fp16", "float16", "f16"):
        # bf16 is the native TPU half precision; we honour an explicit request
        # for IEEE fp16 but default configs map "fp16" to bf16 elsewhere.
        return jnp.float16
    if p in ("int8",):
        return jnp.int8
    raise ValueError(f"unknown precision {precision!r}")


def ConvParams(w, b):
    """A folded conv: {'w': HWIO array, 'b': (O,) array or None}.

    Plain dict so JAX traverses it as a pytree node.
    """
    return {"w": w, "b": b}


class WeightMap:
    """Flat name→flat-float32 map with typed, shaped accessors.

    All accessors return numpy arrays; models assemble them into pytrees and
    cast once at engine-build time.
    """

    def __init__(self, raw: Dict[str, np.ndarray]):
        self.raw = raw
        self.used: set = set()

    def __contains__(self, name: str) -> bool:
        return name in self.raw

    def get_flat(self, name: str) -> np.ndarray:
        if name not in self.raw:
            raise KeyError(
                f"weight {name!r} not found in .wts "
                f"(have {len(self.raw)} tensors; nearby: "
                f"{[k for k in self.raw if k.startswith(name.rsplit('.',1)[0])][:8]})"
            )
        self.used.add(name)
        return self.raw[name]

    def tensor(self, name: str, shape: Tuple[int, ...]) -> np.ndarray:
        flat = self.get_flat(name)
        if flat.size != int(np.prod(shape)):
            raise ValueError(f"{name}: expected {shape} ({int(np.prod(shape))}), got {flat.size}")
        return flat.reshape(shape)

    # -- layer accessors -----------------------------------------------------

    def conv2d(
        self,
        name: str,
        out_c: int,
        in_c: int,
        k: Tuple[int, int],
        groups: int = 1,
        bias: bool = True,
    ) -> ConvParams:
        """Plain conv. Weight ``{name}.weight`` OIHW → HWIO; optional bias."""
        w = self.tensor(f"{name}.weight", (out_c, in_c // groups, k[0], k[1]))
        w = np.transpose(w, (2, 3, 1, 0))  # HWIO
        b = None
        if bias and f"{name}.bias" in self.raw:
            b = self.tensor(f"{name}.bias", (out_c,))
        return ConvParams(w=w, b=b)

    def bn(self, name: str, ch: int, eps: float) -> Tuple[np.ndarray, np.ndarray]:
        """BatchNorm folded to (scale, shift) per channel.

        scale = gamma / sqrt(var + eps); shift = beta - mean * scale
        (yolo11/src/block.cpp:40-72 semantics).
        """
        gamma = self.tensor(f"{name}.weight", (ch,))
        beta = self.tensor(f"{name}.bias", (ch,))
        mean = self.tensor(f"{name}.running_mean", (ch,))
        var = self.tensor(f"{name}.running_var", (ch,))
        scale = gamma / np.sqrt(var + eps)
        shift = beta - mean * scale
        return scale, shift

    def conv_bn(
        self,
        conv_name: str,
        bn_name: str,
        out_c: int,
        in_c: int,
        k: Tuple[int, int],
        groups: int = 1,
        eps: float = 1e-3,
    ) -> ConvParams:
        """Conv + BN folded into a single conv weight/bias (a conv bias, when
        present in the checkpoint, folds through the BN: b' = b·s + shift)."""
        p = self.conv2d(conv_name, out_c, in_c, k, groups=groups, bias=True)
        scale, shift = self.bn(bn_name, out_c, eps)
        w = p["w"] * scale[None, None, None, :]
        b = shift if p["b"] is None else p["b"] * scale + shift
        return ConvParams(w=w, b=b)

    def linear(self, name: str, out_f: int, in_f: int, bias: bool = True) -> dict:
        """torch Linear: weight (out, in) → stored transposed (in, out)."""
        w = self.tensor(f"{name}.weight", (out_f, in_f)).T.copy()
        b = self.tensor(f"{name}.bias", (out_f,)) if bias and f"{name}.bias" in self.raw else None
        return {"w": w, "b": b}

    def vec(self, name: str, n: int) -> np.ndarray:
        return self.tensor(name, (n,))

    # -- diagnostics ---------------------------------------------------------

    def unused(self):
        return sorted(set(self.raw) - self.used)
