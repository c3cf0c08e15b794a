"""Pallas TPU kernel for the one-pass keep-flag NMS.

Reformulation of yolo11/src/postprocess.cu:89-111: for each box i, compute
IoU against all boxes j in VMEM and kill i if a dominating same-class box
overlaps it. The (N,N) IoU matrix is never materialized in HBM — each grid
step holds one (TILE, N) stripe in VMEM.

Layout note: coordinates are passed as separate column (1,N) and row (N,1)
planes instead of an (N,4) table; (T,4) tiles force Mosaic into register
spills (lane dim 4), while (T,1)×(1,N) broadcasts map cleanly onto the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nms_mask_pallas"]

ROW_TILE = 128


def _nms_kernel(rx1, ry1, rx2, ry2, rsc, rcl,
                cx1, cy1, cx2, cy2, csc, ccl, thresh_ref, keep_ref):
    i = pl.program_id(0)
    row = pl.ds(i * ROW_TILE, ROW_TILE)
    x1, y1, x2, y2 = rx1[row, :], ry1[row, :], rx2[row, :], ry2[row, :]  # (T,1)
    sc, cl = rsc[row, :], rcl[row, :]
    ax1, ay1, ax2, ay2 = cx1[:], cy1[:], cx2[:], cy2[:]                  # (1,N)
    asc, acl = csc[:], ccl[:]
    thresh = thresh_ref[0, 0]
    n = ax1.shape[1]

    il = jnp.maximum(x1, ax1)
    it = jnp.maximum(y1, ay1)
    ir = jnp.minimum(x2, ax2)
    ib = jnp.minimum(y2, ay2)
    inter = jnp.maximum(ir - il, 0.0) * jnp.maximum(ib - it, 0.0)
    area_i = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area_j = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
    union = area_i + area_j - inter
    iou = jnp.where(inter > 0.0, inter / union, 0.0)                     # (T,N)

    same = cl == acl
    higher = asc > sc
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, n), 0) + i * ROW_TILE
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (ROW_TILE, n), 1)
    tie = (asc == sc) & (col_ids < row_ids)
    valid_j = asc > 0.0
    dominates = (higher | tie) & same & valid_j & (iou > thresh)
    killed = jnp.any(dominates, axis=1, keepdims=True)
    keep_ref[row, :] = jnp.logical_not(killed) & (sc > 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nms_mask_pallas(boxes, scores, classes, iou_thresh, interpret: bool = False):
    """boxes (N,4) xyxy sorted desc by score; scores (N,) with invalid slots
    ≤ 0; classes (N,) → keep (N,) bool. Semantics match ops.nms.nms_mask."""
    n = boxes.shape[0]
    pad = (-n) % ROW_TILE
    np_ = n + pad
    bx = jnp.pad(boxes.astype(jnp.float32), ((0, pad), (0, 0)))
    sc = jnp.pad(scores.astype(jnp.float32), (0, pad))
    cl = jnp.pad(classes.astype(jnp.float32), (0, pad))
    rows = [bx[:, 0:1], bx[:, 1:2], bx[:, 2:3], bx[:, 3:4], sc[:, None], cl[:, None]]
    cols = [bx[:, 0][None, :], bx[:, 1][None, :], bx[:, 2][None, :],
            bx[:, 3][None, :], sc[None, :], cl[None, :]]
    keep = pl.pallas_call(
        _nms_kernel,
        grid=(np_ // ROW_TILE,),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.bool_),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
        + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*rows, *cols, jnp.asarray(iou_thresh, jnp.float32).reshape(1, 1))
    return keep[:n, 0]
