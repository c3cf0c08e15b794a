"""Shared YOLO block library (ultralytics-family), params + NHWC apply fns.

TPU re-design of the reference's per-model block builders
(yolo11/src/block.cpp: convBnSiLU:74, bottleneck:96, SPPF:113, C3k:220,
C3K2:239, Attention:293, PSABlock:357, C2PSA:380, DWConv; yolov8/src/block.cpp
C2f). BN is folded into conv weights at build time; attention uses batched
einsum on the MXU instead of per-head slice/shuffle/matmul layer chains.

Weight names follow the ultralytics state_dict convention that every
gen_wts.py in the reference dumps (e.g. ``model.2.cv1.conv.weight``).
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp

from tensorrtx_tpu.ops import nn

BN_EPS = 1e-3  # ultralytics BatchNorm2d eps (block.cpp:89 addBatchNorm2d 1e-3)


def get_width(x: int, gw: float, max_channels: int, divisor: int = 8) -> int:
    """Channel scaling (yolo11/src/model.cpp:9-13)."""
    ch = min(x, max_channels)
    return int(math.ceil(ch * gw / divisor)) * divisor


def get_depth(x: int, gd: float) -> int:
    """Depth scaling with round-half-to-even (yolo11/src/model.cpp:15-22)."""
    if x == 1:
        return 1
    return max(int(round(x * gd)), 1)


# ---------------------------------------------------------------------------
# Conv = conv + (folded) BN + SiLU
# ---------------------------------------------------------------------------

def conv_p(wm, name: str, c1: int, c2: int, k: int = 1, groups: int = 1):
    return wm.conv_bn(f"{name}.conv", f"{name}.bn", c2, c1, (k, k),
                      groups=groups, eps=BN_EPS)


def conv_a(p, x, stride: int = 1, pad: int = None, groups: int = 1, act: bool = True):
    kh = p["w"].shape[0]
    if pad is None:
        pad = kh // 2
    y = nn.conv2d(x, p["w"], p["b"], stride=stride, padding=pad, groups=groups)
    return nn.silu(y) if act else y


def dwconv_a(p, x, stride: int = 1, act: bool = True):
    groups = p["w"].shape[3]  # depthwise: O == groups, I/g == 1
    return conv_a(p, x, stride=stride, groups=groups, act=act)


# ---------------------------------------------------------------------------
# Bottleneck / C3k / C3k2 / C2f
# ---------------------------------------------------------------------------

def bottleneck_p(wm, name, c1, c2, k1=3, k2=3, e=0.5):
    c_ = int(c2 * e)
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, c_, k1),
        "cv2": conv_p(wm, f"{name}.cv2", c_, c2, k2),
    }


def bottleneck_a(p, x, shortcut=True):
    y = conv_a(p["cv1"], x)
    y = conv_a(p["cv2"], y)
    # residual only when channels match (c1 == c2), a static shape property
    return x + y if (shortcut and x.shape[-1] == y.shape[-1]) else y


def c3k_p(wm, name, c1, c2, n=2, e=0.5):
    c_ = int(c2 * e)
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, c_),
        "cv2": conv_p(wm, f"{name}.cv2", c1, c_),
        "cv3": conv_p(wm, f"{name}.cv3", 2 * c_, c2),
        "m": [bottleneck_p(wm, f"{name}.m.{i}", c_, c_, e=1.0) for i in range(n)],
    }


def c3k_a(p, x, shortcut=True):
    y1 = conv_a(p["cv1"], x)
    y2 = conv_a(p["cv2"], x)
    for b in p["m"]:
        y1 = bottleneck_a(b, y1, shortcut)
    return conv_a(p["cv3"], jnp.concatenate([y1, y2], axis=-1))


def c3_p(wm, name, c1, c2, n, e=0.5):
    """YOLOv5 C3: bottlenecks use k=(1,3), e=1.0 (ultralytics C3 default)."""
    c_ = int(c2 * e)
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, c_),
        "cv2": conv_p(wm, f"{name}.cv2", c1, c_),
        "cv3": conv_p(wm, f"{name}.cv3", 2 * c_, c2),
        "m": [bottleneck_p(wm, f"{name}.m.{i}", c_, c_, k1=1, k2=3, e=1.0)
              for i in range(n)],
    }


c3_a = c3k_a  # same dataflow; kernel sizes live in the weights


def c3k2_p(wm, name, c1, c2, n, c3k: bool, e=0.5):
    c_ = int(c2 * e)
    blocks = []
    for i in range(n):
        if c3k:
            blocks.append(c3k_p(wm, f"{name}.m.{i}", c_, c_, n=2))
        else:
            blocks.append(bottleneck_p(wm, f"{name}.m.{i}", c_, c_, k1=3, k2=3, e=0.5))
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, 2 * c_),
        "cv2": conv_p(wm, f"{name}.cv2", (2 + n) * c_, c2),
        "m": blocks,
    }


def c3k2_a(p, x, shortcut=True):
    y = conv_a(p["cv1"], x)
    c_ = y.shape[-1] // 2
    parts = [y[..., :c_], y[..., c_:]]
    cur = parts[1]
    for b in p["m"]:
        # C3k blocks are distinguished structurally by their cv3 conv
        cur = c3k_a(b, cur, shortcut) if "cv3" in b else bottleneck_a(b, cur, shortcut)
        parts.append(cur)
    return conv_a(p["cv2"], jnp.concatenate(parts, axis=-1))


def c2f_p(wm, name, c1, c2, n, e=0.5):
    """YOLOv8 C2f (yolov8/src/block.cpp) — same split/append pattern."""
    c_ = int(c2 * e)
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, 2 * c_),
        "cv2": conv_p(wm, f"{name}.cv2", (2 + n) * c_, c2),
        "m": [bottleneck_p(wm, f"{name}.m.{i}", c_, c_, k1=3, k2=3, e=1.0)
              for i in range(n)],
    }


def c2f_a(p, x, shortcut=True):
    y = conv_a(p["cv1"], x)
    c_ = y.shape[-1] // 2
    parts = [y[..., :c_], y[..., c_:]]
    cur = parts[1]
    for b in p["m"]:
        cur = bottleneck_a(b, cur, shortcut)
        parts.append(cur)
    return conv_a(p["cv2"], jnp.concatenate(parts, axis=-1))


# ---------------------------------------------------------------------------
# SPPF
# ---------------------------------------------------------------------------

def sppf_p(wm, name, c1, c2):
    c_ = c1 // 2
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, c_),
        "cv2": conv_p(wm, f"{name}.cv2", c_ * 4, c2),
    }


def sppf_a(p, x, k: int = 5):
    y = conv_a(p["cv1"], x)
    p1 = nn.max_pool(y, k, 1, k // 2)
    p2 = nn.max_pool(p1, k, 1, k // 2)
    p3 = nn.max_pool(p2, k, 1, k // 2)
    return conv_a(p["cv2"], jnp.concatenate([y, p1, p2, p3], axis=-1))


# ---------------------------------------------------------------------------
# C2PSA attention stack
# ---------------------------------------------------------------------------

def attention_p(wm, name, dim, num_heads, attn_ratio=0.5):
    head_dim = dim // num_heads
    key_dim = int(head_dim * attn_ratio)
    h = dim + key_dim * num_heads * 2
    return {
        "qkv": conv_p(wm, f"{name}.qkv", dim, h),
        "pe": conv_p(wm, f"{name}.pe", dim, dim, k=3, groups=dim),
        "proj": conv_p(wm, f"{name}.proj", dim, dim),
    }


def attention_a(p, x, attn_ratio=0.5):
    """Multi-head self-attention over the spatial grid (block.cpp:295-355),
    as batched einsum → softmax → einsum on the MXU.

    Head geometry is derived from static weight shapes (C2PSA always uses
    num_heads = dim//64, attn_ratio = 0.5), keeping the params pytree
    arrays-only."""
    b, hgt, wid, dim = x.shape
    nh = max(dim // 64, 1)
    hd = dim // nh
    kd = int(hd * attn_ratio)
    n = hgt * wid
    qkv = conv_a(p["qkv"], x, act=False).reshape(b, n, nh, 2 * kd + hd)
    q = qkv[..., :kd]
    k = qkv[..., kd:2 * kd]
    v = qkv[..., 2 * kd:]
    scale = kd ** -0.5
    attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(b, hgt, wid, nh * hd)
    v_sp = v.reshape(b, hgt, wid, nh * hd)
    out = out + dwconv_a(p["pe"], v_sp, act=False)
    return conv_a(p["proj"], out, act=False)


def psablock_p(wm, name, dim, attn_ratio=0.5, num_heads=None):
    if num_heads is None:
        num_heads = dim // 64
    return {
        "attn": attention_p(wm, f"{name}.attn", dim, num_heads, attn_ratio),
        "ffn0": conv_p(wm, f"{name}.ffn.0", dim, dim * 2),
        "ffn1": conv_p(wm, f"{name}.ffn.1", dim * 2, dim),
    }


def psablock_a(p, x, shortcut=True):
    y = attention_a(p["attn"], x)
    x = x + y if shortcut else y
    f = conv_a(p["ffn0"], x)
    f = conv_a(p["ffn1"], f, act=False)
    return x + f if shortcut else f


def c2psa_p(wm, name, c1, c2, n, e=0.5):
    c = int(c1 * e)
    return {
        "cv1": conv_p(wm, f"{name}.cv1", c1, 2 * c),
        "cv2": conv_p(wm, f"{name}.cv2", 2 * c, c2),
        "m": [psablock_p(wm, f"{name}.m.{i}", c) for i in range(n)],
    }


def c2psa_a(p, x):
    y = conv_a(p["cv1"], x)
    c = y.shape[-1] // 2
    a, bpart = y[..., :c], y[..., c:]
    for blk in p["m"]:
        bpart = psablock_a(blk, bpart, shortcut=True)
    return conv_a(p["cv2"], jnp.concatenate([a, bpart], axis=-1))


def conv_s2d_s1_a(p, x2):
    """silu(stride-1 conv) evaluated in 2×2-s2d phase space (k=1 gives a
    block-diagonal kernel, k=3 a 3×3 block kernel; ops/nn.conv2d_s2d_s1)."""
    return nn.silu(nn.conv2d_s2d_s1(
        x2, nn.s2d_s1_conv_weights(p["w"]), p["b"]))


def c3k2_s2d_a(p, x2, shortcut=True):
    """c3k2_a evaluated on a 2×2-s2d tensor (phase blocks (a, b, c)) —
    the serving fast path keeps the largest feature grids in phase space,
    where the tiny-channel convs become wide-K block convs (the 16/8-ch
    convs at the P2 grid ran at ~3 TF/s in planar form). Channel split/
    concat happen inside each phase block. Plain-bottleneck variants only
    (C3k sub-blocks take the planar path); numerically identical to
    s2d(c3k2_a(...)); quant-context order matches c3k2_a."""
    y = conv_s2d_s1_a(p["cv1"], x2)
    b_, h2, w2, c4 = y.shape
    c_ = c4 // 8
    yr = y.reshape(b_, h2, w2, 4, 2 * c_)
    parts = [yr[..., :c_], yr[..., c_:]]
    cur = parts[1]
    for bp in p["m"]:
        z = conv_s2d_s1_a(bp["cv1"], cur.reshape(b_, h2, w2, -1))
        z = conv_s2d_s1_a(bp["cv2"], z)
        z = z.reshape(b_, h2, w2, 4, c_)
        cur = cur + z if (shortcut and cur.shape[-1] == z.shape[-1]) else z
        parts.append(cur)
    cat = jnp.concatenate(parts, axis=-1).reshape(b_, h2, w2, -1)
    return conv_s2d_s1_a(p["cv2"], cat)


def conv_s2dh_a(p, xh, in_segments=None, out_segments=None):
    """silu(stride-1 conv) on a row-phase tensor (ops/nn.conv2d_s2dh)."""
    w1 = nn.s2dh_s1_conv_weights(p["w"], in_segments=in_segments,
                                 out_segments=out_segments)
    return nn.silu(nn.conv2d_s2dh(xh, w1, p["b"],
                                  out_segments=out_segments))


def c3k2_s2dh_a(p, xh, shortcut=True):
    """c3k2_a on a row-phase tensor (B, H/2, W, 2C) — the b32/b1 fast form
    for C≤64 stages: 2C fills the 128 MXU lanes (the NHWC C64 convs ran at
    ~45 of 197 TF/s at batch 32; row-phase 66+ despite the structural 2×
    MACs of the block kernel). cv1 emits its two halves as whole segments
    (out_segments) so the split/concat are plain minor-dim slices at
    segment boundaries; numerically identical to c3k2_a modulo dot order.
    Plain-bottleneck variants only (mirrors c3k2_s2d_a)."""
    c_ = p["cv1"]["w"].shape[-1] // 2      # per-phase half width
    y = conv_s2dh_a(p["cv1"], xh, out_segments=(c_, c_))
    parts = [y[..., :2 * c_], y[..., 2 * c_:]]
    cur = parts[1]
    for bp in p["m"]:
        z = conv_s2dh_a(bp["cv1"], cur)
        z = conv_s2dh_a(bp["cv2"], z)
        cur = cur + z if (shortcut and cur.shape[-1] == z.shape[-1]) else z
        parts.append(cur)
    cat = jnp.concatenate(parts, axis=-1)
    return conv_s2dh_a(p["cv2"], cat, in_segments=(c_,) * len(parts))


def c3k2_down_a(p4, p5, x, shortcut=True):
    """The shared "P3 c3k2/c2f stage + stride-2 downsample" backbone motif
    (yolo11/v8/v12/26 m4+m5), row-phase when it pays: at batch ≤8 the C≤64
    stage convs fill only half the MXU lanes, so the stage runs on a
    `space_to_depth_h` tensor (2C lanes) and the downsample conv exits
    phase space for free (ops/nn.conv2d_s2dh_exit). Returns (c4, down).
    Numerically identical to (c3k2_a, conv_a stride-2) modulo dot order."""
    if (c3k2_is_plain(p4) and x.shape[1] % 2 == 0 and x.shape[0] <= 8
            and p5["w"].shape[0] % 2 == 1):
        ch = c3k2_s2dh_a(p4, nn.space_to_depth_h(x), shortcut=shortcut)
        down = nn.silu(nn.conv2d_s2dh_exit(
            ch, nn.s2dh_exit_conv_weights(p5["w"]), p5["b"]))
        return nn.depth_to_space_h(ch), down
    c4 = c3k2_a(p4, x, shortcut=shortcut)
    return c4, conv_a(p5, c4, stride=2)


def c3_s2dh_a(p, xh, shortcut=True):
    """c3_a / c3k_a on a row-phase tensor (B, H/2, W, 2C) — cv1/cv2 run in
    parallel on x, bottlenecks chain on the cv1 branch, and the two-way
    concat is a whole-segment append handled by cv3's in_segments weight
    permutation. Numerically identical to c3_a modulo dot order; quant
    -context order matches c3_a (cv1, cv2, m…, cv3)."""
    c_ = p["cv1"]["w"].shape[-1]
    y1 = conv_s2dh_a(p["cv1"], xh)
    y2 = conv_s2dh_a(p["cv2"], xh)
    for bp in p["m"]:
        z = conv_s2dh_a(bp["cv1"], y1)
        z = conv_s2dh_a(bp["cv2"], z)
        y1 = y1 + z if (shortcut and y1.shape[-1] == z.shape[-1]) else z
    cat = jnp.concatenate([y1, y2], axis=-1)
    return conv_s2dh_a(p["cv3"], cat, in_segments=(c_, c_))


def c3_down_a(p_c3, p_down, x, shortcut=True):
    """The YOLOv5-family "C3 stage + stride-2 downsample" backbone motif
    (m2+m3, m4+m5) — row-phase when it pays (see c3k2_down_a: C≤64 stage
    convs at batch ≤8 fill only half the MXU lanes, and the 16-ch P2
    bottleneck convs ping-pong ~100 µs/img of layout copies at batch 1).
    Returns (c_stage, down); numerically identical to (c3_a, conv_a
    stride-2) modulo dot order. The planar c_stage return is dead code XLA
    eliminates unless the caller uses it (the neck taps m4, not m2)."""
    if (x.shape[1] % 2 == 0 and x.shape[0] <= 8
            and p_down["w"].shape[0] % 2 == 1):
        ch = c3_s2dh_a(p_c3, nn.space_to_depth_h(x), shortcut=shortcut)
        down = nn.silu(nn.conv2d_s2dh_exit(
            ch, nn.s2dh_exit_conv_weights(p_down["w"]), p_down["b"]))
        return nn.depth_to_space_h(ch), down
    c = c3_a(p_c3, x, shortcut=shortcut)
    return c, conv_a(p_down, c, stride=2)


# ---------------------------------------------------------------------------
# Batch-phase (bp) param transforms: fold f images into channels
# (ops/nn.py batch_fold / bp_conv_weights rationale). The transformed param
# trees run through the UNCHANGED apply fns above — conv_a reads kernel
# size from the weights, c3k2_a slices halves of cv1's output (which
# out_segments=(c_, c_) makes valid folded tensors), and the (2+n)-way
# concat into cv2 is absorbed by in_segments. Exact per-image numerics:
# the block-diagonal zeros add exact +0 to every accumulator.
# ---------------------------------------------------------------------------

def bp_conv_p(p, f, in_segments=None, out_segments=None):
    return {"w": nn.bp_conv_weights(p["w"], f, in_segments, out_segments),
            "b": nn.bp_bias(p.get("b"), f, out_segments)}


def bp_bottleneck_p(p, f):
    return {"cv1": bp_conv_p(p["cv1"], f), "cv2": bp_conv_p(p["cv2"], f)}


def bp_c3k_p(p, f, in_segments=None):
    """in_segments: per-image widths when the stage input is a concat of
    folded tensors (the v5 neck's upsample-lateral concats feed C3 stages
    directly — both cv1 and cv2 read the concat)."""
    c_ = p["cv1"]["w"].shape[-1]
    return {"cv1": bp_conv_p(p["cv1"], f, in_segments=in_segments),
            "cv2": bp_conv_p(p["cv2"], f, in_segments=in_segments),
            "cv3": bp_conv_p(p["cv3"], f, in_segments=(c_, c_)),
            "m": [bp_bottleneck_p(b, f) for b in p["m"]]}


def bp_c3k2_p(p, f, in_segments=None):
    """in_segments: per-image widths when the stage input is a concat of
    folded tensors (the neck's upsample-lateral concats)."""
    c2_ = p["cv1"]["w"].shape[-1]
    c_ = c2_ // 2
    n = len(p["m"])
    return {
        "cv1": bp_conv_p(p["cv1"], f, in_segments=in_segments,
                         out_segments=(c_, c_)),
        "cv2": bp_conv_p(p["cv2"], f, in_segments=(c_,) * (2 + n)),
        "m": [bp_c3k_p(b, f) if "cv3" in b else bp_bottleneck_p(b, f)
              for b in p["m"]],
    }


def c3k2_bp_refold_a(p, x, f, fi, shortcut=True):
    """c3k2 on a batch-folded tensor with a DEEPER fold for the inner
    bottleneck chain: the P2 stage's 8/16-channel bottlenecks fill only
    16/32 MXU lanes at f=2 (38.7 µs/img at b32), so the chain runs at
    fi (e.g. 8 → 64/128 lanes) and refolds back for the concat. Exact
    c3k2_a numerics; refolds are ~1 µs/img reshapes."""
    c2_ = p["cv1"]["w"].shape[-1]
    c_ = c2_ // 2
    y = conv_a(bp_conv_p(p["cv1"], f, out_segments=(c_, c_)), x)
    parts = [y[..., :f * c_], y[..., f * c_:]]
    cur = nn.batch_fold(nn.batch_unfold(parts[1], f), fi)
    for b in p["m"]:
        blk = bp_c3k_p(b, fi) if "cv3" in b else bp_bottleneck_p(b, fi)
        cur = (c3k_a(blk, cur, shortcut) if "cv3" in b
               else bottleneck_a(blk, cur, shortcut))
        parts.append(nn.batch_fold(nn.batch_unfold(cur, fi), f))
    cat = jnp.concatenate(parts, axis=-1)
    n = len(p["m"])
    return conv_a(bp_conv_p(p["cv2"], f, in_segments=(c_,) * (2 + n)), cat)


def bp_dwconv_p(p, f):
    """Depthwise conv on a folded tensor: per-channel weights tile f× along
    the channel axis (dwconv_a reads groups from the weight shape)."""
    return {"w": jnp.tile(p["w"], (1, 1, 1, f)),
            "b": nn.bp_bias(p.get("b"), f)}


def conv_s2d_s1_bp_a(p, x2f, f, in_segments=None):
    """conv_s2d_s1_a on a batch-folded 2×2-s2d tensor. in_segments=(ci,)*4
    when the input is phase-major-of-fold (fresh from space_to_depth2 of a
    folded planar tensor); None when fold-major (chained bp convs).
    Output is always fold-major [img0(a,b,co) | img1(a,b,co)]."""
    w1, pads = nn.s2d_s1_conv_weights(p["w"])
    y = nn.conv2d_s2d_s1(
        x2f, (nn.bp_conv_weights(w1, f, in_segments=in_segments), pads),
        None)
    return nn.silu(y + jnp.tile(jnp.tile(p["b"], 4), f))


def c3k2_s2d_bp_a(p, x2f, f, shortcut=True):
    """c3k2_s2d_a on a batch-folded phase-space tensor: the P2 stage's
    8/16-channel convs get 4× lanes from the 2×2 phase AND f× from the
    batch fold (16ch × 4 × f=2 → 128 full MXU lanes). x2f comes from
    space_to_depth2 of a folded planar tensor (phase-major-of-fold; cv1
    absorbs that layout via in_segments). Exact c3k2_a numerics."""
    ci = x2f.shape[-1] // (4 * f)
    y = conv_s2d_s1_bp_a(p["cv1"], x2f, f, in_segments=(ci,) * 4)
    b_, h2, w2, cfl = y.shape
    c_ = cfl // (8 * f)
    yr = y.reshape(b_, h2, w2, f, 4, 2 * c_)
    parts = [yr[..., :c_], yr[..., c_:]]
    cur = parts[1]
    for bp in p["m"]:
        z = conv_s2d_s1_bp_a(bp["cv1"], cur.reshape(b_, h2, w2, -1), f)
        z = conv_s2d_s1_bp_a(bp["cv2"], z, f)
        z = z.reshape(b_, h2, w2, f, 4, c_)
        cur = cur + z if (shortcut and cur.shape[-1] == z.shape[-1]) else z
        parts.append(cur)
    cat = jnp.concatenate(parts, axis=-1).reshape(b_, h2, w2, -1)
    return conv_s2d_s1_bp_a(p["cv2"], cat, f)


def c3k2_is_plain(p) -> bool:
    """True when every sub-block is a plain bottleneck (no C3k)."""
    return all("cv3" not in b for b in p["m"])


def stem_s1s2_s2d_a(p0, p1, x2, act=nn.silu):
    """Full-res stride-1 conv + stride-2 conv evaluated on a 2×2
    space-to-depth input (ops.preprocess.letterbox_s2d factor=2) — the
    batch-1 serving fast path for stems that open stride-1 on the raw
    image (yolov7 silu, scaled-yolov4 mish, yolov3 leaky). Numerically
    identical to act(conv(p0, x, s1)) → act(conv(p1, ·, s2)); see
    ops/nn.py conv2d_s2d_s1."""
    y = act(nn.conv2d_s2d_s1(x2, nn.s2d_s1_conv_weights(p0["w"]), p0["b"]))
    return act(nn.conv2d_s2d(y, nn.s2d_conv_weights(p1["w"]), p1["b"]))


def stem_s2d_a(p0, p1, x4, p0_pad=None):
    """The two stride-2 stem convs evaluated on a 4×4 space-to-depth
    input (ops.preprocess.letterbox_s2d factor=4) — the batch-1 serving
    fast path shared by the ultralytics-style detectors (yolo11/v8/v9/v10/
    v12/26 3×3 stems; yolov5's 6×6 p2 stem via p0_pad=2). Numerically
    identical to conv_a(p0, x, s2, pad=p0_pad) → conv_a(p1, ·, s2);
    see ops/nn.py conv2d_s2d4."""
    y1 = nn.silu(nn.conv2d_s2d4(
        x4, nn.s2d4_conv_weights(p0["w"], p0_pad), p0["b"]))
    return nn.silu(nn.conv2d_s2d(y1, nn.s2d_conv_weights(p1["w"]), p1["b"]))
