"""Int8-resident chain twins of the shared YOLO blocks (_yolo_blocks).

Each helper mirrors its float twin's dataflow exactly, with every op routed
through an ops.qchain.ChainCtx — so the same function body serves both the
calibration (tap) pass and the int8-resident serving pass, and the
scale/weight slot order is aligned by construction. See ops/qchain.py for
the formulation and PERF.md §INT8 for the measured rationale.

Reference analog: inside a TensorRT int8 engine every one of these blocks
is an int8-in/int8-out region with fused requant epilogues; the reference
builds them via builder flags (yolo11/src/model.cpp USE_INT8 +
calibrator), here the chain mirror makes the same structure explicit.
"""

from __future__ import annotations

import jax.numpy as jnp

from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.qchain import ChainCtx, QTensor


def _ch(x) -> int:
    return (x.q if isinstance(x, QTensor) else x).shape[-1]


def qconv_a(ctx: ChainCtx, p, x, stride: int = 1, act: bool = True):
    return ctx.conv(x, p["w"], p.get("b"), act="silu" if act else None,
                    stride=stride)


def qbottleneck_a(ctx, p, x, shortcut=True):
    y = qconv_a(ctx, p["cv1"], x)
    y = qconv_a(ctx, p["cv2"], y)
    if shortcut and _ch(x) == _ch(y):
        return ctx.add(x, y)
    return y


def qc3k_a(ctx, p, x, shortcut=True):
    y1 = qconv_a(ctx, p["cv1"], x)
    y2 = qconv_a(ctx, p["cv2"], x)
    for b in p["m"]:
        y1 = qbottleneck_a(ctx, b, y1, shortcut)
    return qconv_a(ctx, p["cv3"], ctx.concat([y1, y2]))


def qc3k2_a(ctx, p, x, shortcut=True):
    y = qconv_a(ctx, p["cv1"], x)
    c_ = _ch(y) // 2
    parts = ctx.split(y, (c_, c_))
    cur = parts[1]
    for b in p["m"]:
        cur = (qc3k_a(ctx, b, cur, shortcut) if "cv3" in b
               else qbottleneck_a(ctx, b, cur, shortcut))
        parts.append(cur)
    return qconv_a(ctx, p["cv2"], ctx.concat(parts))


def qsppf_a(ctx, p, x, k: int = 5):
    y = qconv_a(ctx, p["cv1"], x)
    p1 = ctx.maxpool(y, k)
    p2 = ctx.maxpool(p1, k)
    p3 = ctx.maxpool(p2, k)
    return qconv_a(ctx, p["cv2"], ctx.concat([y, p1, p2, p3]))


def qc2psa_a(ctx, p, x):
    """C2PSA attention stack as a float island: softmax/einsum attention
    stays in the model dtype (TRT likewise leaves these layers fp16 in an
    int8 engine), re-entering the chain at the exit."""
    xf = ctx.to_float(x)
    y = B.c2psa_a(p, xf)
    return ctx.from_float(y)


# c2f (yolov8) and C3 (yolov5) params run through the c3k2/c3k mirrors
# unchanged — same dataflow, kernel sizes live in the weights (the float
# twins are aliased the same way in _yolo_blocks: c3_a = c3k_a).
qc2f_a = qc3k2_a
qc3_a = qc3k_a


# -- GELAN (yolov9) chain twins: mirror models/yolov9.py's float blocks
# (reference yolov9/src/block.cpp: RepConvN :156, RepNCSP :185,
# RepNCSPELAN4 :230, ADown :264, SPPELAN :342) ------------------------------

def qrepconvn_a(ctx, rp, x):
    """RepConvN = silu(conv3x3(x) + conv1x1(x)). The 1×1 branch requants
    at its own slot and re-enters as the fused conv's residual — one
    conv+add+silu requant epilogue, the TRT fusion shape."""
    r = ctx.conv(x, rp["conv2"]["w"], rp["conv2"]["b"], act=None)
    return ctx.conv_add(x, rp["conv1"]["w"], rp["conv1"]["b"], r,
                        act="silu")


def qrepncsp_a(ctx, np_, x):
    y = qconv_a(ctx, np_["cv1"], x)
    for m in np_["m"]:
        h = qconv_a(ctx, m["cv2"], qrepconvn_a(ctx, m["cv1"], y))
        y = ctx.add(y, h)
    y2 = qconv_a(ctx, np_["cv2"], x)
    return qconv_a(ctx, np_["cv3"], ctx.concat([y, y2]))


def qelan4_a(ctx, ep, x):
    y = qconv_a(ctx, ep["cv1"], x)
    half = _ch(y) // 2
    s1, s2 = ctx.split(y, (half, half))
    y2 = qconv_a(ctx, ep["cv2_1"], qrepncsp_a(ctx, ep["cv2_0"], s2))
    y3 = qconv_a(ctx, ep["cv3_1"], qrepncsp_a(ctx, ep["cv3_0"], y2))
    return qconv_a(ctx, ep["cv4"], ctx.concat([s1, s2, y2, y3]))


def qadown_a(ctx, ap, x):
    y = ctx.avgpool2_s1(x)
    half = _ch(y) // 2
    ya, yb = ctx.split(y, (half, half))
    y1 = qconv_a(ctx, ap["cv1"], ya, stride=2)
    y2 = qconv_a(ctx, ap["cv2"], ctx.maxpool(yb, 3, 2, 1))
    return ctx.concat([y1, y2])


def qsppelan_a(ctx, sp, x):
    y = qconv_a(ctx, sp["cv1"], x)
    m1 = ctx.maxpool(y, 5)
    m2 = ctx.maxpool(m1, 5)
    m3 = ctx.maxpool(m2, 5)
    return qconv_a(ctx, sp["cv5"], ctx.concat([y, m1, m2, m3]))


def qbranch3_grouped(ctx, p, x, groups: int):
    """The v9 grouped box branch: dense block-diagonal weights (exact;
    keeps the group-split layout out of the DFL decode — ops/nn.py
    dense_grouped_weights, same as the float _branch3)."""
    y = qconv_a(ctx, p["a"], x)
    wb = nn.dense_grouped_weights(p["b"]["w"], groups)
    y = ctx.conv(y, wb, p["b"]["b"], act="silu", padding=wb.shape[0] // 2)
    wc = nn.dense_grouped_weights(p["c"]["w"], groups)
    return ctx.conv_out(y, wc, p["c"]["b"])


def qbranch3(ctx, p, x):
    """Plain a→b conv pair + 1×1 float-out head branch (yolov8's cv2 AND
    cv3 branches — v8 has no dwconv in the cls branch, unlike yolo11)."""
    y = qconv_a(ctx, p["a"], x)
    y = qconv_a(ctx, p["b"], y)
    return ctx.conv_out(y, p["c"]["w"], p["c"]["b"])


def qbranch3_bp(ctx, p, x, f):
    """Folded-tensor qbranch3 (block-diagonal weights)."""
    y = qconv_a(ctx, B.bp_conv_p(p["a"], f), x)
    y = qconv_a(ctx, B.bp_conv_p(p["b"], f), y)
    return ctx.conv_out(y, nn.bp_conv_weights(p["c"]["w"], f),
                        nn.bp_bias(p["c"]["b"], f))


def qdet_head_lv(ctx, q, r, f):
    """One detect-head level (box cv2 + cls cv3 branches) on a chain
    tensor; final 1×1s emit float logits (the decode tail's inputs)."""
    y = qconv_a(ctx, q["a"], f)
    y = qconv_a(ctx, q["b"], y)
    box = ctx.conv_out(y, q["c"]["w"], q["c"]["b"])
    z = ctx.dwconv(f, r["a0"]["w"], r["a0"]["b"])
    z = qconv_a(ctx, r["a1"], z)
    z = ctx.dwconv(z, r["b0"]["w"], r["b0"]["b"])
    z = qconv_a(ctx, r["b1"], z)
    cls = ctx.conv_out(z, r["c"]["w"], r["c"]["b"])
    return box, cls


def qdet_head_lv_bp(ctx, q, r, ff, f):
    """Folded-tensor variant of qdet_head_lv (block-diagonal weights)."""
    y = qconv_a(ctx, B.bp_conv_p(q["a"], f), ff)
    y = qconv_a(ctx, B.bp_conv_p(q["b"], f), y)
    box = ctx.conv_out(y, nn.bp_conv_weights(q["c"]["w"], f),
                       nn.bp_bias(q["c"]["b"], f))
    rp = B.bp_dwconv_p(r["a0"], f)
    z = ctx.dwconv(ff, rp["w"], rp["b"])
    z = qconv_a(ctx, B.bp_conv_p(r["a1"], f), z)
    rp = B.bp_dwconv_p(r["b0"], f)
    z = ctx.dwconv(z, rp["w"], rp["b"])
    z = qconv_a(ctx, B.bp_conv_p(r["b1"], f), z)
    cls = ctx.conv_out(z, nn.bp_conv_weights(r["c"]["w"], f),
                       nn.bp_bias(r["c"]["b"], f))
    return box, cls
