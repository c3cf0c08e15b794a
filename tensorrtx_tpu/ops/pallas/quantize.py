"""Pallas TPU kernels for int8 activation quantization.

The reference's int8 path happens inside TensorRT's engine; our analog
(core/quant.py) quantizes activations before each conv. XLA fuses the
round/clip fine, but for large activations this kernel keeps the quantize
step resident in VMEM and optionally applies stochastic rounding for
calibration experiments (pallas_guide.md quantization patterns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantize_int8", "quantize_int8_stochastic"]


def _quant_kernel(x_ref, scale_ref, out_ref):
    s = scale_ref[0, 0]
    v = jnp.round(x_ref[:] * (1.0 / s))
    out_ref[:] = jnp.clip(v, -127.0, 127.0).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8(x, scale, interpret: bool = False):
    """x (..., N) float32, scale scalar → int8, symmetric round-to-nearest."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 1024
    flat = jnp.pad(flat, (0, pad)).reshape(-1, 1024)
    out = pl.pallas_call(
        _quant_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, jnp.asarray(scale, jnp.float32).reshape(1, 1))
    return out.reshape(-1)[:n].reshape(x.shape)


def _quant_sr_kernel(x_ref, scale_ref, seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0])
    s = scale_ref[0, 0]
    scaled = x_ref[:] * (1.0 / s)
    scaled = jnp.clip(scaled, -127.0, 127.0)
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    out_ref[:] = pltpu.stochastic_round(scaled, bits, target_dtype=jnp.int8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def quantize_int8_stochastic(x, scale, seed, interpret: bool = False):
    """Stochastic-rounding variant (pallas_guide.md §Quantization Kernels)."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % 1024
    flat = jnp.pad(flat, (0, pad)).reshape(-1, 1024)
    out = pl.pallas_call(
        _quant_sr_kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, jnp.asarray(scale, jnp.float32).reshape(1, 1),
      jnp.asarray([seed], jnp.int32))
    return out.reshape(-1)[:n].reshape(x.shape)
