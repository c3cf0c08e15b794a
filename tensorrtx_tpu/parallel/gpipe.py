"""GPipe-style microbatch pipeline over a mesh axis (shard_map + ppermute).

`EnginePipeline` (pipeline.py) overlaps *different engines* on device
groups from the host. This module pipelines ONE model whose body is a
stack of identical blocks (transformer encoders: vit, detr, the
FormulaNet/SLANeXt encoders) *inside a single jitted program*: stage s
lives on device s of the `pp` mesh axis, microbatches flow through a
`lax.scan` schedule, and `lax.ppermute` moves activations over ICI each
tick. No host involvement per step — the TPU-native replacement for the
reference's stream/event pipelining.

Constraints (by construction of SPMD pipelining): every stage consumes
and produces activations of the same shape, and the stage count equals
the size of the `pp` axis. Stage parameters are stacked on a leading
axis and sharded one-stage-per-device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["gpipe_apply", "shard_stage_params"]


def shard_stage_params(params_stacked, mesh: Mesh, axis: str = "pp"):
    """Place stage-stacked params (leading dim = n_stages) one per device."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, P(axis))), params_stacked)


def gpipe_apply(stage_fn: Callable, mesh: Mesh, axis: str = "pp"):
    """Build a jitted pipelined forward.

    stage_fn(stage_params, x) -> y with y.shape == x.shape.
    Returns fn(params_stacked, xs) where params_stacked has leading dim
    n_stages (= mesh.shape[axis]) and xs is (n_micro, mb, ...) microbatched
    input; output is (n_micro, mb, ...) after all stages, replicated.

    Schedule: n_micro + n_stages − 1 ticks. At tick t, stage s computes
    microbatch t − s (when in range); activations ppermute one hop along
    the ring each tick. Bubble fraction = (S−1)/(T), the standard GPipe
    trade — raise n_micro to amortize.
    """
    from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[axis]

    def spmd(p_local, xs):
        # p_local: this device's stage params (leading dim 1); xs replicated
        p_mine = jax.tree.map(lambda l: l[0], p_local)
        idx = lax.axis_index(axis)
        n_micro = xs.shape[0]
        ticks = n_micro + n_stages - 1
        # the scan carry becomes device-varying after ppermute; mark the
        # initial zeros as varying over the pp axis so carry types match
        state = lax.pvary(jnp.zeros_like(xs[0]), (axis,))
        outs = lax.pvary(jnp.zeros_like(xs), (axis,))
        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(carry, t):
            state_in, outs = carry
            # stage 0 ingests microbatch t; later stages take the ring value
            feed = xs[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(idx == 0, feed, state_in)
            y = stage_fn(p_mine, x_in)
            # the last stage emits microbatch t − (S−1)
            w = t - (n_stages - 1)
            valid = (idx == n_stages - 1) & (w >= 0) & (w < n_micro)
            outs = jnp.where(
                valid,
                lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(w, 0, n_micro - 1), 0),
                outs)
            return (lax.ppermute(y, axis, ring), outs), None

        (state, outs), _ = lax.scan(step, (state, outs), jnp.arange(ticks))
        # only the last device holds real outputs; broadcast over the ring
        outs = lax.psum(jnp.where(idx == n_stages - 1, outs, 0.0), axis)
        return outs

    def fn(params_stacked, xs):
        return shard_map(
            spmd, mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis), params_stacked),
                      P()),
            out_specs=P())(params_stacked, xs)

    return jax.jit(fn)
