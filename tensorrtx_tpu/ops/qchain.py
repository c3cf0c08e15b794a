"""Int8-RESIDENT chained quantization: activations live in HBM as int8.

The float-resident int8 path (core/quant.py QuantizedEngine, the analog of
TensorRT's per-layer Q/DQ fallback) pays a standalone quantize pass per
conv: read bf16 (2 B/elem) + write int8 (1 B) before the dot, then write
bf16 (2 B) after — ~6 B/elem of HBM traffic vs bf16's 4. On v5e that
inverts the reference's "int8 is the fastest tier" ordering
(yolov9/README.md:42). This module implements what TensorRT actually does
inside an int8 engine: the conv epilogue fuses dequant + bias + activation
+ REQUANT to the consumer's scale, so the tensor crossing HBM is int8
end-to-end (2 B/elem, int8 MXU rate). Measured on 8-layer conv+SiLU
chains at yolo11's hot shapes this beats bf16 by 1.3-2.5×
(tools/int8_microbench.py, PERF.md §INT8).

Design: a `ChainCtx` threads through a *chain mirror* of a model's forward
(e.g. models/yolo11.apply_chain_folded). The same mirror code runs in
three modes, which guarantees slot alignment by construction:

  tap      float forward; records per-production-point post-activation
           |x|max taps (the calibration pass, ≙ Int8EntropyCalibrator2
           feeding builder observers) and the concrete conv weights
           (run eagerly once to collect weights for offline quantization)
  run      int8-resident forward consuming pre-quantized weights + the
           calibrated scale table

Activations use symmetric per-tensor scales; weights per-output-channel
(TRT's scheme). Monotone ops (maxpool, nearest upsample, reshape-like
fold/unfold/slice) run directly on the int8 payload — exact. Float
islands (attention, decode) dequantize in and requantize out.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

f32 = jnp.float32


class QTensor(NamedTuple):
    """Symmetric-int8 activation: value ≈ q · s (zero-point 0)."""
    q: jax.Array      # int8 payload, NHWC
    s: jax.Array      # scalar f32 scale


def _rq(o, s_out):
    """f32 → int8 at scale s_out (round-to-nearest, saturate)."""
    return jnp.clip(jnp.round(o / s_out), -127, 127).astype(jnp.int8)


def _act_f(o, act):
    if act == "silu":
        return o * jax.nn.sigmoid(o)
    if act == "relu":
        return jnp.maximum(o, 0.0)
    assert act is None, act
    return o


class ChainCtx:
    """Mode-polymorphic op context for int8-resident chain mirrors.

    tap mode: call with float tensors; `taps` fills with |x|max of every
    produced activation (in slot order) and `ws` with every conv weight
    (concrete when run eagerly). run mode: call with `QTensor`s; consumes
    `scales` (f32 (S,) array, traced) and `wq`/`sw` lists by the same
    slot order.
    """

    # Single shared default for the chain entry point: "m3" = hybrid entry
    # (bf16 160² stem/m2, chain from m3 — the measured winner, PERF.md
    # §INT8); "stem" = chain from the first conv. ChainedInt8Engine and any
    # hand-built calibration ctx MUST agree on this or slot counts differ —
    # hence one default here and apply_chain reading ctx.enter directly.
    DEFAULT_ENTER = "m3"

    def __init__(self, mode: str, scales=None, wq: Optional[List] = None,
                 sw: Optional[List] = None, dtype=jnp.bfloat16,
                 enter: str = DEFAULT_ENTER, pallas: Optional[bool] = None):
        assert mode in ("tap", "run")
        assert enter in ("stem", "m3"), enter
        self.mode = mode
        self.scales = scales
        self.wq = wq
        self.sw = sw
        self.enter = enter
        self.dtype = dtype
        # pallas=True dispatches eligible convs to the fused in-kernel-
        # requant Mosaic kernels (ops/pallas/qconv.py). Default OFF: the
        # kernels win ISOLATED (1.3-2.1× on 16-layer chains at C≥128,
        # PERF.md §INT8) but LOSE COMPOSED into the full model — measured
        # v5e yolo11n-640, b32 3051→2738 img/s, b128 4834→4303, every gate
        # subset (only-1×1, only-3×3, only-C≥256) also negative. The b32
        # trace shows why: the kernels remove 20.7 µs/img of XLA conv-
        # fusion time but cost 35.7 µs/img of custom-call time plus
        # +19.4 µs/img of new data-formatting copies at the pallas_call
        # boundaries (XLA relayouts s8 operands around each custom call
        # instead of fusing the requant into the producer). Full tables in
        # PERF.md §INT8. Tests pass pallas="interpret" to exercise the
        # dispatch path on CPU.
        if pallas is None:
            pallas = False
        assert pallas in (True, False, "interpret"), pallas
        self.pallas = pallas
        self.taps: List = []
        self.ws: List = []
        self.w_is_dw: List[bool] = []   # tap mode: which ws are depthwise
        self._si = 0
        self._wi = 0

    def _qconv_fn(self, wq, stride, pads, H, W):
        """The fused Pallas kernel serving this conv's shape, or None."""
        if not self.pallas:
            return None
        k, _, C, Co = wq.shape
        st = stride if isinstance(stride, int) else stride[0]
        p = k // 2
        if pads != ((p, p), (p, p)):
            return None
        from tensorrtx_tpu.ops.pallas import qconv as _qc

        if not _qc.supports(k, st, H, W, C, Co):
            return None
        base = _qc.qconv1x1 if k == 1 else _qc.qconv3x3
        if self.pallas == "interpret":
            return lambda *a, **kw: base(*a, interpret=True, **kw)
        return base

    # -- slot bookkeeping ---------------------------------------------------
    def _next_scale(self):
        i = self._si
        self._si += 1
        return self.scales[i]

    def _tap(self, x):
        self._si += 1
        self.taps.append(jnp.max(jnp.abs(x.astype(f32))))

    def _next_w(self):
        i = self._wi
        self._wi += 1
        return self.wq[i], self.sw[i]

    @property
    def n_scales(self) -> int:
        return self._si

    # -- ops ----------------------------------------------------------------
    def quant_in(self, x):
        """Network entry: float activation → QTensor (one scale slot)."""
        if self.mode == "tap":
            self._tap(x)
            return x
        s = self._next_scale()
        return QTensor(_rq(x.astype(f32), s), s)

    def conv(self, x, w, b=None, act: str = "silu", stride=1, padding=None,
             pads=None):
        """conv + bias + act, requantized to this tensor's calibrated scale.

        `pads` = ((pbh, pah), (pbw, paw)) explicit pre-padding (s2d stem
        form); else `padding` symmetric int (default k//2)."""
        st = (stride, stride) if isinstance(stride, int) else stride
        if pads is None:
            p = (w.shape[0] // 2 if padding is None else padding)
            pads = ((p, p), (p, p))
        if self.mode == "tap":
            self.ws.append(w)
            self.w_is_dw.append(False)
            self._wi += 1
            o = lax.conv_general_dilated(
                x, w.astype(x.dtype), st, list(pads),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            o = o.astype(f32)
            if b is not None:
                o = o + b.astype(f32)
            o = _act_f(o, act)
            self._tap(o)
            return o.astype(x.dtype)
        wq, sw = self._next_w()
        s_out = self._next_scale()
        fn = self._qconv_fn(wq, stride, pads, x.q.shape[1], x.q.shape[2])
        if fn is not None:
            return QTensor(fn(x.q, wq, x.s * sw, b, s_out, act=act), s_out)
        # padding rides the conv op (an explicit jnp.pad between the
        # previous requant and this conv breaks XLA's conv output fusion —
        # the s32 accumulator then materializes in HBM; measured +30%)
        acc = lax.conv_general_dilated(
            x.q, wq, st, list(pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        o = acc.astype(f32) * (x.s * sw)[None, None, None, :]
        if b is not None:
            o = o + b.astype(f32)
        return QTensor(_rq(_act_f(o, act), s_out), s_out)

    def conv_add(self, x, w, b, res, act: str = "relu", stride=1,
                 padding=None):
        """conv + bias + residual add + act, requantized — the TensorRT
        conv+add+relu fusion at ResNet bottleneck exits (the int8 engine
        keeps the whole block int8-resident; one scale slot for the fused
        output). `res` is a chain tensor (QTensor in run mode)."""
        st = (stride, stride) if isinstance(stride, int) else stride
        p = (w.shape[0] // 2 if padding is None else padding)
        pads = ((p, p), (p, p))
        if self.mode == "tap":
            self.ws.append(w)
            self.w_is_dw.append(False)
            self._wi += 1
            o = lax.conv_general_dilated(
                x, w.astype(x.dtype), st, list(pads),
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(f32)
            if b is not None:
                o = o + b.astype(f32)
            o = _act_f(o + res.astype(f32), act)
            self._tap(o)
            return o.astype(x.dtype)
        wq, sw = self._next_w()
        s_out = self._next_scale()
        fn = self._qconv_fn(wq, stride, pads, x.q.shape[1], x.q.shape[2])
        if fn is not None:
            return QTensor(fn(x.q, wq, x.s * sw, b, s_out, act=act,
                              residual=res.q, res_scale=res.s), s_out)
        acc = lax.conv_general_dilated(
            x.q, wq, st, list(pads),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        o = acc.astype(f32) * (x.s * sw)[None, None, None, :]
        if b is not None:
            o = o + b.astype(f32)
        o = o + res.q.astype(f32) * res.s
        return QTensor(_rq(_act_f(o, act), s_out), s_out)

    def conv_out(self, x, w, b=None, act: Optional[str] = None):
        """Chain exit conv: int8 dot, float output (no requant slot)."""
        if self.mode == "tap":
            self.ws.append(w)
            self.w_is_dw.append(False)
            self._wi += 1
            p = w.shape[0] // 2
            o = lax.conv_general_dilated(
                x, w.astype(x.dtype), (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(f32)
            if b is not None:
                o = o + b.astype(f32)
            return _act_f(o, act).astype(self.dtype)
        wq, sw = self._next_w()
        p = wq.shape[0] // 2
        fn = self._qconv_fn(wq, 1, ((p, p), (p, p)),
                            x.q.shape[1], x.q.shape[2])
        if fn is not None:
            return fn(x.q, wq, x.s * sw, b, 1.0, act=act,
                      out_float=True, out_dtype=self.dtype)
        acc = lax.conv_general_dilated(
            x.q, wq, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        o = acc.astype(f32) * (x.s * sw)[None, None, None, :]
        if b is not None:
            o = o + b.astype(f32)
        return _act_f(o, act).astype(self.dtype)

    def dwconv(self, x, w, b=None, act: str = "silu", stride=1):
        """Depthwise conv: float fallback (MXU gains nothing from int8
        here — same per-layer fallback TRT uses), requantized out."""
        groups = w.shape[3]
        p = w.shape[0] // 2
        st = (stride, stride) if isinstance(stride, int) else stride
        if self.mode == "tap":
            self.ws.append(w)
            self.w_is_dw.append(True)
            self._wi += 1
            o = lax.conv_general_dilated(
                x, w.astype(x.dtype), st, [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups).astype(f32)
            if b is not None:
                o = o + b.astype(f32)
            o = _act_f(o, act)
            self._tap(o)
            return o.astype(x.dtype)
        wq, sw = self._next_w()        # float weight stored as-is for dw
        s_out = self._next_scale()
        xf = (x.q.astype(f32) * x.s).astype(self.dtype)
        o = lax.conv_general_dilated(
            xf, wq.astype(self.dtype), st, [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups).astype(f32)
        if b is not None:
            o = o + b.astype(f32)
        return QTensor(_rq(_act_f(o, act), s_out), s_out)

    def concat(self, xs: Sequence, axis: int = -1):
        """Channel concat; segments requantize to one shared scale slot."""
        if self.mode == "tap":
            o = jnp.concatenate(xs, axis=axis)
            self._tap(o)
            return o
        s_out = self._next_scale()
        parts = [jnp.clip(jnp.round(x.q.astype(f32) * (x.s / s_out)),
                          -127, 127).astype(jnp.int8) for x in xs]
        return QTensor(jnp.concatenate(parts, axis=axis), s_out)

    def add(self, a, b):
        """Residual add (bottleneck shortcut); one scale slot."""
        if self.mode == "tap":
            o = a + b
            self._tap(o)
            return o
        s_out = self._next_scale()
        o = a.q.astype(f32) * a.s + b.q.astype(f32) * b.s
        return QTensor(_rq(o, s_out), s_out)

    def maxpool(self, x, k: int, stride: int = 1, pad: Optional[int] = None):
        """Max-pool directly on the int8 payload — monotone, exact."""
        p = k // 2 if pad is None else pad
        if self.mode == "tap":
            from tensorrtx_tpu.ops import nn as _nn

            return _nn.max_pool(x, k, stride, p)
        q = lax.reduce_window(
            x.q, jnp.int8(-128), lax.max, (1, k, k, 1),
            (1, stride, stride, 1), [(0, 0), (p, p), (p, p), (0, 0)])
        return QTensor(q, x.s)

    def upsample(self, x, factor: int = 2):
        """Nearest upsample on the payload — exact."""
        from tensorrtx_tpu.ops import nn as _nn

        if self.mode == "tap":
            return _nn.upsample_nearest(x, factor)
        return QTensor(_nn.upsample_nearest(x.q, factor), x.s)

    def avgpool2_s1(self, x):
        """k=2 s=1 average pool (the GELAN ADown/AConv prefix,
        yolov9/src/block.cpp:264). Linear, so it runs on the payload: the
        int32 window sum is exact and the ÷4 re-rounds onto the SAME scale
        — ≤0.5 LSB, no new scale slot."""
        if self.mode == "tap":
            from tensorrtx_tpu.ops import nn as _nn

            return _nn.avg_pool(x, 2, 1)
        acc = lax.reduce_window(
            x.q.astype(jnp.int32), jnp.int32(0), lax.add, (1, 2, 2, 1),
            (1, 1, 1, 1), [(0, 0), (0, 0), (0, 0), (0, 0)])
        q = jnp.clip(jnp.round(acc.astype(f32) * 0.25), -127, 127
                     ).astype(jnp.int8)
        return QTensor(q, x.s)

    def add_n(self, xs: Sequence):
        """Sum of N chain tensors (CBFuse, yolov9/src/block.cpp:314-341);
        one shared scale slot for the fused sum."""
        if self.mode == "tap":
            o = xs[0]
            for x in xs[1:]:
                o = o + x
            self._tap(o)
            return o
        s_out = self._next_scale()
        o = xs[0].q.astype(f32) * xs[0].s
        for x in xs[1:]:
            o = o + x.q.astype(f32) * x.s
        return QTensor(_rq(o, s_out), s_out)

    def split(self, x, sizes: Sequence[int], axis: int = -1):
        """Static channel split — same scale, free."""
        offs = np.cumsum([0] + list(sizes))
        if self.mode == "tap":
            return [lax.slice_in_dim(x, offs[i], offs[i + 1], axis=axis)
                    for i in range(len(sizes))]
        return [QTensor(lax.slice_in_dim(x.q, offs[i], offs[i + 1],
                                         axis=axis), x.s)
                for i in range(len(sizes))]

    def map_q(self, x, fn):
        """Apply a pure reindexing (reshape/transpose/fold) to the payload."""
        if self.mode == "tap":
            return fn(x)
        return QTensor(fn(x.q), x.s)

    def to_float(self, x):
        """Dequantize (enter a float island / the decode tail)."""
        if self.mode == "tap":
            return x
        return (x.q.astype(f32) * x.s).astype(self.dtype)

    def from_float(self, x):
        """Re-enter the int8 chain after a float island (one scale slot)."""
        return self.quant_in(x)


def quantize_chain_weights(ws: List[np.ndarray], dw_flags: List[bool]):
    """Per-output-channel int8 weights + scales for a collected weight list.

    Depthwise entries (dw_flags[i]) stay float (the dw fallback path);
    their sw slot is a placeholder. Returns (wq, sw)."""
    wq, sw = [], []
    for w, is_dw in zip(ws, dw_flags):
        w = np.asarray(w, np.float32)
        if is_dw:
            wq.append(jnp.asarray(w, jnp.bfloat16))
            sw.append(np.ones((w.shape[-1],), np.float32))
            continue
        s = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-8)
        wq.append(jnp.asarray(
            np.clip(np.round(w / s[None, None, None, :]), -127, 127),
            jnp.int8))
        sw.append(s.astype(np.float32))
    return wq, sw
