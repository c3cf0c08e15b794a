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

__all__ = ["gpipe_apply", "gpipe_apply_hetero", "shard_stage_params",
           "gpipe_serving_step"]


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


def gpipe_serving_step(engine, mesh: Mesh, axis: str = "pp"):
    """User-facing GPipe inference for models exposing a `gpipe_split`
    (registry hook): pre/post run replicated, the uniform block stack is
    pipelined one stage per device (`cli run --pp N`).

    Returns step(x_nhwc) — jitted, batch = n_micro microbatches of 1 —
    numerically identical to engine.model.apply.
    """
    split = getattr(engine.model, "gpipe_split", None)
    if split is None:
        raise ValueError(
            f"{engine.model.name} has no homogeneous stage split; "
            "--pp supports transformer-encoder models (vit)")
    n_stages = mesh.shape[axis]
    pre, stage_fn, stacked, post = split(engine.params, engine.cfg, n_stages)
    stacked = shard_stage_params(stacked, mesh, axis)
    pipe = gpipe_apply(stage_fn, mesh, axis)
    params = engine.params

    @jax.jit
    def step(x):
        y = pre(params, x)                       # (B, N, D), replicated
        b = y.shape[0]
        ys = y.reshape(b, 1, *y.shape[1:])       # n_micro=B, microbatch=1
        out = pipe(stacked, ys).reshape(b, *y.shape[1:])
        return post(params, out)

    return step


def gpipe_apply_hetero(stage_fns, stage_params, in_shapes, out_shape,
                       mesh: Mesh, axis: str = "pp",
                       act_dtype=jnp.float32):
    """GPipe pipelining for HETEROGENEOUS stages (per-boundary shapes).

    Conv backbones change activation shape per stage (a resnet stage halves
    H,W and doubles C), which the homogeneous `gpipe_apply` cannot express:
    SPMD pipelining ppermutes ONE carry type around the ring. Here every
    boundary activation is packed into a flat ring buffer sized to the
    LARGEST boundary, each device runs only its own stage via `lax.switch`
    on the pp index, and per-stage parameters (arbitrary pytrees of
    different structure per stage) are flattened to padded rows of one
    (S, L) float32 array sharded one-row-per-device — so weights, like the
    reference's per-GPU engines (tutorials/multi_GPU_processing.md:13-30),
    live only on their stage's chip.

    Args:
      stage_fns: list of S callables ``fn(params_s, x_s) -> y_s``.
      stage_params: list of S parameter pytrees (float leaves).
      in_shapes: per-microbatch input shape of each stage (mb dim first);
        stage s output shape must equal ``in_shapes[s+1]``.
      out_shape: shape of the last stage's output.
      act_dtype: dtype of the packed ring buffer (activations are cast in
        and out of it per stage).

    Returns (jitted_fn, packed_params) with
    ``jitted_fn(packed_params, xs)`` where xs is (n_micro, *in_shapes[0]);
    output (n_micro, *out_shape), replicated.
    """
    from jax.experimental.shard_map import shard_map

    n_stages = mesh.shape[axis]
    assert len(stage_fns) == len(stage_params) == len(in_shapes) == n_stages

    import numpy as _np

    all_shapes = list(in_shapes) + [tuple(out_shape)]
    sizes = [int(_np.prod(s)) for s in all_shapes]
    F = max(sizes)

    # flatten every stage's params to one padded float32 row
    leaves_meta = []          # per stage: [(offset, shape, dtype), ...]
    rows = []
    for ps in stage_params:
        leaves = jax.tree.leaves(ps)
        meta, chunks, off = [], [], 0
        for leaf in leaves:
            a = jnp.asarray(leaf)
            meta.append((off, a.shape, a.dtype))
            chunks.append(a.astype(jnp.float32).ravel())
            off += a.size
        leaves_meta.append(meta)
        rows.append(jnp.concatenate(chunks) if chunks
                    else jnp.zeros((0,), jnp.float32))
    L = max(r.shape[0] for r in rows)
    packed = jnp.stack([jnp.pad(r, (0, L - r.shape[0])) for r in rows])
    packed = jax.device_put(packed, NamedSharding(mesh, P(axis)))
    treedefs = [jax.tree.structure(ps) for ps in stage_params]

    def _unflatten(s, row):
        meta = leaves_meta[s]
        leaves = [row[off:off + int(_np.prod(shp))].reshape(shp).astype(dt)
                  for (off, shp, dt) in meta]
        return jax.tree.unflatten(treedefs[s], leaves)

    def _pack(y):
        flat = y.astype(act_dtype).ravel()
        return jnp.pad(flat, (0, F - flat.shape[0]))

    def _branch(s):
        def run(row, buf):
            params = _unflatten(s, row)
            x = buf[:sizes[s]].reshape(in_shapes[s])
            y = stage_fns[s](params, x)
            assert tuple(y.shape) == tuple(all_shapes[s + 1]), (
                f"stage {s} produced {y.shape}, expected {all_shapes[s + 1]}")
            return _pack(y)
        return run

    branches = [_branch(s) for s in range(n_stages)]

    def spmd(p_local, xs_flat):
        row = p_local[0]
        idx = lax.axis_index(axis)
        n_micro = xs_flat.shape[0]
        ticks = n_micro + n_stages - 1
        state = lax.pvary(jnp.zeros((F,), act_dtype), (axis,))
        outs = lax.pvary(jnp.zeros((n_micro, F), act_dtype), (axis,))
        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def step(carry, t):
            state_in, outs = carry
            feed = xs_flat[jnp.clip(t, 0, n_micro - 1)]
            x_in = jnp.where(idx == 0, feed, state_in)
            y = lax.switch(idx, branches, row, x_in)
            w = t - (n_stages - 1)
            valid = (idx == n_stages - 1) & (w >= 0) & (w < n_micro)
            outs = jnp.where(
                valid,
                lax.dynamic_update_index_in_dim(
                    outs, y, jnp.clip(w, 0, n_micro - 1), 0),
                outs)
            return (lax.ppermute(y, axis, ring), outs), None

        (_, outs), _ = lax.scan(step, (state, outs), jnp.arange(ticks))
        outs = lax.psum(jnp.where(idx == n_stages - 1, outs, 0.0), axis)
        return outs

    def fn(packed_params, xs):
        n_micro = xs.shape[0]
        xs_flat = jax.vmap(_pack)(xs)
        outs = shard_map(spmd, mesh=mesh, in_specs=(P(axis), P()),
                         out_specs=P())(packed_params, xs_flat)
        return outs[:, :sizes[-1]].reshape((n_micro,) + tuple(out_shape))

    return jax.jit(fn), packed
