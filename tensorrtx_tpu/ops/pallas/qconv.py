"""Fused int8-resident conv kernels (Mosaic/Pallas): the in-kernel-requant
tier of the chained int8 engine.

Why: the XLA lowering of the chained int8 path (ops/qchain.py) compiles the
requant epilogue (s32 acc → ·scale → +bias → SiLU → round → s8) as a
standalone elementwise pass, so every conv round-trips a 4 B/elem int32
accumulator through HBM before writing the 1 B/elem int8 activation — and
its s8 layout assignment oscillates between W-minor and C-minor at small-C
stages (trace analysis in PERF.md §INT8; the r4 verdict's top item). These
kernels run the whole producer contract of a TensorRT int8 engine inside
one VMEM residency: int8×int8→int32 MXU dot, then dequant+bias+activation+
requant (or residual-add / float-exit) in VMEM, writing only the int8 (or
final float) tensor to HBM.

Formulation: activations are viewed as (B, P=H·W, C) flattened pixels —
a free bitcast of NHWC. Pixels stream through the MXU as *rows* (the
streaming dimension has no tile-occupancy cost) and output channels sit
in lanes. A 3×3 tap at (dy, dx) is the flattened-pixel shift dy·W + dx,
so the conv is NINE tap-accumulated dots: unaligned int8 sublane slices
out of a halo'd int8 scratch feed (tp, C) @ (C, Co) int8 MXU dots that
accumulate in int32 registers. (A first draft materialized the im2col
matrix through an f32 interior — 45 B/elem of VPU copy traffic — and
measured 0.42× of the XLA chain; tap-accumulation removes the copies
entirely. Unaligned int8 sublane slices verified PASS on this Mosaic
toolchain, tools_probe_mosaic.py.) Column wrap-around at image edges is
masked per-tap with a static (i mod W) pattern; row halos come from
prev/current/next block views (conv_planar's clamped-index trick),
zero-filled at image bounds.

Numerics: identical to qchain's XLA path modulo the VPU transcendental in
SiLU (the int32 accumulator is exact; requant rounding is the same
round-half-even / clip sequence), so outputs may differ by ±1 LSB on
rounding-boundary values only — tests budget that (tests/test_qconv_pallas.py).

Reference analog: the per-model fused INT8 conv+activation plugins TRT
emits inside an int8 engine (e.g. yolo11 USE_INT8 build path,
/root/reference/yolo11/src/model.cpp); here one kernel family serves every
chained model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["qconv3x3", "qconv1x1", "supports"]

f32 = jnp.float32


def _act_f(o, act):
    if act == "silu":
        return o * jax.nn.sigmoid(o)
    if act == "relu":
        return jnp.maximum(o, 0.0)
    assert act is None, act
    return o


def supports(k: int, stride, H: int, W: int, C: int, Co: int) -> bool:
    """Shapes where the fused kernel measured faster than the XLA chain
    lowering ISOLATED (16-layer chain bench on v5e, see PERF.md §INT8):
      k=1 C≥256: 2.1× (XLA's int8 1×1 pays an unfused requant pass)
      k=3 C≥128: 1.3× (tap-accumulated dots, full-lane contraction)
    At C≤64 / 160² maps XLA's conv lowering wins 2-3× over every Pallas
    formulation tried (im2col-f32, int8-tap-dots, int8-im2col) — the MXU
    is lane-starved and XLA's spatial blocking is better; those stay XLA.

    COMPOSED into the full chained model the dispatch is a net loss at
    every gate subset (b32 3051→2738 img/s; trace: −20.7 µs/img conv
    fusion, +35.7 custom-call, +19.4 boundary relayout copies — PERF.md
    §INT8), so ChainCtx defaults pallas=False and this gate only applies
    when a caller opts in.
    """
    st = stride if isinstance(stride, int) else stride[0]
    if st != 1 or k not in (1, 3):
        return False
    if k == 1:
        return C >= 256
    if W < 16 or H < 4:
        return False  # halo/tile shape constraints on tiny maps
    return C >= 128 and Co >= 128


def _pick_rh(H, W, C, Co, budget=4 << 20):
    """Image rows per tile: bound the VMEM residency (3 int8 input block
    views + int8 halo scratch + int32 accumulator + output block)."""
    per_row = W * (4 * C + 8 * Co)
    rh = max(min(H, budget // max(per_row, 1)), 2)
    while H % rh:
        rh -= 1
    return rh


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_float", "out_dtype", "interpret", "rh"))
def qconv3x3(xq, wq, scale, bias, s_out, act="silu", residual=None,
             res_scale=None, out_float=False, out_dtype=jnp.bfloat16,
             interpret=False, rh=None):
    """3×3 stride-1 SAME conv on int8 NHWC, epilogue fused in VMEM.

    xq (B, H, W, C) int8; wq (3, 3, C, Co) int8; scale (Co,) f32 = s_in·s_w;
    bias (Co,) f32 or None; s_out scalar f32 (requant scale, ignored when
    out_float). residual: optional int8 (B, H, W, Co) with scalar res_scale,
    added BEFORE the activation (the conv+add+act fusion of qchain.conv_add). Returns int8 (B, H, W, Co) — or out_dtype when
    out_float (the chain-exit conv_out form).
    """
    B, H, W, C = xq.shape
    Co = wq.shape[-1]
    if rh is None:
        rh = _pick_rh(H, W, C, Co)
    tp = rh * W                       # pixels per tile
    nt = H // rh
    halo = -(-(W + 1) // 32) * 32     # int8-aligned halo row count
    x2 = xq.reshape(B, H * W, C)
    # taps as 9 separate (C, Co) mats, tap-major to match the dy/dx loop
    wtaps = wq.reshape(9, C, Co)
    bias = jnp.zeros((Co,), f32) if bias is None else bias.astype(f32)
    scale = scale.astype(f32)
    souts = jnp.asarray(s_out, f32).reshape(1, 1)
    has_res = residual is not None
    res2 = residual.reshape(B, H * W, Co) if has_res else None

    def kernel(xp_ref, xc_ref, xn_ref, w_ref, sc_ref, b_ref, so_ref, *rest):
        if has_res:
            r_ref, rs_ref, out_ref, xs = rest
        else:
            out_ref, xs = rest
        t = pl.program_id(1)
        # int8 halo'd interior from the prev/current/next block views
        xs[halo:halo + tp] = xc_ref[0]
        z8 = jnp.zeros((halo, C), jnp.int8)
        xs[0:halo] = jnp.where(t > 0, xp_ref[0, tp - halo:tp], z8)
        xs[halo + tp:halo + tp + halo] = jnp.where(
            t < nt - 1, xn_ref[0, 0:halo], z8)
        # nine tap-accumulated int8 dots; dot k: slice at dy·W + dx
        col = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0) % W
        acc = None
        k = 0
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                s = halo + dy * W + dx
                v = xs[s:s + tp]
                if dx == -1:
                    v = jnp.where(col != 0, v, jnp.zeros_like(v))
                elif dx == 1:
                    v = jnp.where(col != W - 1, v, jnp.zeros_like(v))
                d = jax.lax.dot_general(
                    v, w_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
                k += 1
        o = acc.astype(f32) * sc_ref[:].reshape(1, Co) + b_ref[:].reshape(1, Co)
        if has_res:       # pre-act residual: the conv+add+act fusion form
            o = o + r_ref[0].astype(f32) * rs_ref[0, 0]
        o = _act_f(o, act)
        if out_float:
            out_ref[0] = o.astype(out_ref.dtype)
        else:
            out_ref[0] = jnp.clip(jnp.round(o / so_ref[0, 0]),
                                  -127, 127).astype(jnp.int8)

    xtile = lambda off: pl.BlockSpec(  # noqa: E731
        (1, tp, C),
        lambda bb, t, _o=off: (bb, jnp.clip(t + _o, 0, nt - 1), 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        xtile(-1), xtile(0), xtile(1),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # w
        pl.BlockSpec(memory_space=pltpu.VMEM),   # scale
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
        pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
    ]
    args = [x2, x2, x2, wtaps, scale, bias, souts]
    if has_res:
        in_specs += [
            pl.BlockSpec((1, tp, Co), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ]
        args += [res2, jnp.asarray(res_scale, f32).reshape(1, 1)]
    odt = out_dtype if out_float else jnp.int8
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, Co), lambda bb, t: (bb, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, Co), odt),
        scratch_shapes=[pltpu.VMEM((tp + 2 * halo, C), jnp.int8)],
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, W, Co)


@functools.partial(
    jax.jit,
    static_argnames=("act", "out_float", "out_dtype", "interpret", "rh"))
def qconv1x1(xq, wq, scale, bias, s_out, act="silu", residual=None,
             res_scale=None, out_float=False, out_dtype=jnp.bfloat16,
             interpret=False, rh=None):
    """1×1 conv on int8 NHWC — a straight int8 matmul, epilogue fused."""
    B, H, W, C = xq.shape
    w2 = wq.reshape(-1, wq.shape[-1])
    Co = w2.shape[-1]
    P = H * W
    if rh is None:
        per_row = (C + Co) * W
        rh = max(min(H, (2 << 20) // max(per_row, 1)), 1)
        while H % rh:
            rh -= 1
    tp = rh * W
    x2 = xq.reshape(B, P, C)
    bias = jnp.zeros((Co,), f32) if bias is None else bias.astype(f32)
    souts = jnp.asarray(s_out, f32).reshape(1, 1)
    has_res = residual is not None
    res2 = residual.reshape(B, P, Co) if has_res else None

    def kernel(x_ref, w_ref, sc_ref, b_ref, so_ref, *rest):
        if has_res:
            r_ref, rs_ref, out_ref = rest
        else:
            (out_ref,) = rest
        acc = jax.lax.dot_general(
            x_ref[0], w_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        o = acc.astype(f32) * sc_ref[:].reshape(1, Co) + b_ref[:].reshape(1, Co)
        if has_res:       # pre-act residual: the conv+add+act fusion form
            o = o + r_ref[0].astype(f32) * rs_ref[0, 0]
        o = _act_f(o, act)
        if out_float:
            out_ref[0] = o.astype(out_ref.dtype)
        else:
            out_ref[0] = jnp.clip(jnp.round(o / so_ref[0, 0]),
                                  -127, 127).astype(jnp.int8)

    in_specs = [
        pl.BlockSpec((1, tp, C), lambda bb, t: (bb, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
    ]
    args = [x2, w2, scale.astype(f32), bias, souts]
    if has_res:
        in_specs += [
            pl.BlockSpec((1, tp, Co), lambda bb, t: (bb, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ]
        args += [res2, jnp.asarray(res_scale, f32).reshape(1, 1)]
    odt = out_dtype if out_float else jnp.int8
    out = pl.pallas_call(
        kernel,
        grid=(B, P // tp),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tp, Co), lambda bb, t: (bb, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, Co), odt),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, W, Co)
