"""INT8 static-range quantization with image-directory calibration.

TPU-native analog of the reference's Int8EntropyCalibrator2
(yolo11/src/calibrator.cpp:9-74, yolo11/include/calibrator.h): stream
calibration batches through the fp32 network, collect per-conv activation
statistics, choose scales (TRT-style KL/entropy, percentile, or absmax),
cache them to a table file (≙ int8calib.table), and build a quantized engine
whose convs run int8×int8→int32 on the MXU.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.engine import Engine
from tensorrtx_tpu.ops import quant_ctx

__all__ = ["calibrate", "entropy_scale", "save_scale_cache",
           "load_scale_cache", "QuantizedEngine", "ChainedInt8Engine",
           "weight_scales"]

HIST_BINS = 2048
QUANT_BINS = 128


def entropy_scale(hist: np.ndarray, absmax: float) -> float:
    """TensorRT-style KL-divergence threshold search over a 2048-bin
    histogram of |x| with range [0, absmax]; returns scale = T / 127."""
    hist = hist.astype(np.float64)
    total = hist.sum()
    if total == 0 or absmax == 0:
        return max(absmax / 127.0, 1e-8)
    bin_w = absmax / HIST_BINS
    best_kl, best_i = np.inf, HIST_BINS
    for i in range(QUANT_BINS, HIST_BINS + 1, 8):
        p = hist[:i].copy()
        outliers = hist[i:].sum()
        p[-1] += outliers
        if p.sum() == 0:
            continue
        # quantize p into QUANT_BINS, then expand back
        chunks = np.array_split(p, QUANT_BINS)
        q = np.zeros_like(p)
        pos = 0
        for c in chunks:
            n = len(c)
            nz = (c > 0).sum()
            if nz > 0:
                q[pos:pos + n] = np.where(c > 0, c.sum() / nz, 0)
            pos += n
        pm = p / p.sum()
        qm = q / max(q.sum(), 1e-12)
        mask = pm > 0
        kl = float(np.sum(pm[mask] * np.log(pm[mask] / np.maximum(qm[mask], 1e-12))))
        if kl < best_kl:
            best_kl, best_i = kl, i
    threshold = (best_i + 0.5) * bin_w
    return max(threshold / 127.0, 1e-8)


def percentile_scale(hist: np.ndarray, absmax: float, pct: float = 99.99) -> float:
    c = np.cumsum(hist.astype(np.float64))
    if c[-1] == 0:
        return max(absmax / 127.0, 1e-8)
    idx = int(np.searchsorted(c, c[-1] * pct / 100.0))
    return max((idx + 0.5) * absmax / HIST_BINS / 127.0, 1e-8)


def calibrate(engine: Engine, batches: Iterable[np.ndarray],
              method: str = "entropy") -> np.ndarray:
    """Run calibration batches through the fp32 graph; return per-conv input
    scales (trace order). ``batches``: NHWC float arrays, already preprocessed
    (the reference streams preprocessed images the same way,
    calibrator.cpp:33-56)."""
    batches = list(batches)
    model, cfg = engine.model, engine.cfg

    def tapped(mode, ranges=None):
        def fn(params, x):
            state = quant_ctx.QuantState(mode, hist_ranges=ranges, hist_bins=HIST_BINS)
            with quant_ctx.quant_context(state):
                out = model.apply(params, x, cfg)
            return [t for t in state.taps]
        return jax.jit(fn)

    # pass 1: absmax per layer across all batches
    absmax = None
    fn1 = tapped("tap_absmax")
    for b in batches:
        taps = [np.asarray(t) for t in fn1(engine.params, jnp.asarray(b))]
        cur = np.array(taps)
        absmax = cur if absmax is None else np.maximum(absmax, cur)
    if method == "absmax":
        return np.maximum(absmax / 127.0, 1e-8)

    # pass 2: histograms at fixed ranges
    hists = None
    fn2 = tapped("tap_hist", ranges=absmax)
    for b in batches:
        taps = [np.asarray(t) for t in fn2(engine.params, jnp.asarray(b))]
        hists = taps if hists is None else [h + t for h, t in zip(hists, taps)]

    chooser = entropy_scale if method == "entropy" else percentile_scale
    return np.array([chooser(h, float(a)) for h, a in zip(hists, absmax)],
                    np.float32)


def weight_scales(engine: Engine,
                  ws: Optional[List[np.ndarray]] = None) -> List[np.ndarray]:
    """Per-conv per-output-channel |w|max/127 in conv trace order.

    Collected by spying on ops.nn.conv2d during one eager forward with the
    concrete params: eager execution visits convs in exactly the order the
    jitted quant trace will.
    """
    if ws is None:
        ws = _conv_weights(engine)
    return [np.maximum(np.abs(w.astype(np.float32)).max(axis=(0, 1, 2)) / 127.0,
                       1e-8) for w in ws]


def save_scale_cache(path: str, act_scales: np.ndarray, meta: dict = None):
    """The int8calib.table analog (calibrator.cpp:58-74)."""
    with open(path, "w") as f:
        json.dump({"format": "tensorrtx-tpu-int8-v1",
                   "act_scales": np.asarray(act_scales).tolist(),
                   "meta": meta or {}}, f)


def load_scale_cache(path: str) -> np.ndarray:
    with open(path) as f:
        d = json.load(f)
    return np.asarray(d["act_scales"], np.float32)


class QuantizedEngine:
    """Engine wrapper whose convs run the int8 path (grouped convs stay fp).

    Weights are quantized ONCE here (per-output-channel |w|max/127) and the
    int8 tensors are passed into the jitted program — the forward never
    re-rounds fp weights. Serializes alongside the fp engine so `cli run`
    can reload it (≙ the reference's int8calib.table + engine pairing).
    """

    def __init__(self, engine: Engine, act_scales: np.ndarray):
        self.engine = engine
        self.model = engine.model
        self.cfg = engine.cfg
        self.name = engine.name
        self.precision = "int8"
        self.act_scales = np.asarray(act_scales, np.float32)
        ws = _conv_weights(engine)
        self.w_scales = weight_scales(engine, ws)
        self.wq = [jnp.asarray(np.clip(
            np.round(np.asarray(w, np.float32)
                     / s[None, None, None, :]), -127, 127).astype(np.int8))
            for w, s in zip(ws, self.w_scales)]
        model, cfg = engine.model, engine.cfg

        def fn(params, wq, x):
            state = quant_ctx.QuantState(
                "quant", act_scales=self.act_scales, w_scales=self.w_scales,
                wq=wq)
            with quant_ctx.quant_context(state):
                return model.apply(params, x, cfg)

        self._jitted = jax.jit(fn)

    @property
    def params(self):
        return self.engine.params

    def __call__(self, x):
        return self._jitted(self.engine.params, self.wq, jnp.asarray(x))

    def raw_apply(self, params, x):
        """Traceable int8 forward (wq enters the trace as constants)."""
        state = quant_ctx.QuantState(
            "quant", act_scales=self.act_scales, w_scales=self.w_scales,
            wq=self.wq)
        with quant_ctx.quant_context(state):
            return self.model.apply(params, x, self.cfg)

    def raw_apply_s2d(self, params, x2):
        """Traceable int8 forward on the s2d serving fast path: the two
        rearranged stem convs re-quantize in-trace with the standard path's
        scales (ops.nn._maybe_quant_conv_s2d — an s2d tensor is a pixel
        permutation, so scales transfer); the rest consume self.wq in the
        same trace order as raw_apply."""
        state = quant_ctx.QuantState(
            "quant", act_scales=self.act_scales, w_scales=self.w_scales,
            wq=self.wq)
        with quant_ctx.quant_context(state):
            return self.model.apply_s2d(params, x2, self.cfg)

    def save(self, path: str) -> None:
        self.engine.save(path)
        save_scale_cache(os.path.join(path, "int8calib.json"),
                         self.act_scales, {"model": self.engine.name})
        # flag the engine dir as int8 so load_engine reconstructs this class
        meta_path = os.path.join(path, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["int8"] = True
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)

    @staticmethod
    def load(path: str) -> "QuantizedEngine":
        eng = Engine.load(path)
        scales = load_scale_cache(os.path.join(path, "int8calib.json"))
        return QuantizedEngine(eng, scales)


class ChainedInt8Engine:
    """Int8-RESIDENT serving engine: activations cross HBM as int8.

    Built on a model's `apply_chain` mirror (ops/qchain.py): every conv is
    int8×int8→int32 with a fused dequant+bias+act+requant epilogue — the
    structure inside a real TensorRT int8 engine, vs QuantizedEngine's
    per-layer float-resident Q/DQ. Serving contract matches
    ServingPipeline: uint8 frames → fused letterbox_s2d → chain → dets.

    Weight collection runs the tap pass once eagerly on CPU (weights are
    input-independent); `calibrate()` then streams uint8 frame batches
    through the jitted tap pass on device to set activation scales
    (absmax/127 per production point — the Int8EntropyCalibrator2 analog
    for the chained tier).
    """

    def __init__(self, engine: Engine, bgr_to_rgb: bool = False,
                 fold: int = 2, enter: str = "m3", pallas=None):
        from tensorrtx_tpu.ops import qchain
        from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

        model, cfg = engine.model, engine.cfg
        chain = model.apply_chain
        if chain is None or not chain.supports(cfg):
            raise ValueError(f"{engine.name}: no chained int8 path for this cfg")
        self.engine = engine
        self.model, self.cfg, self.name = model, cfg, engine.name
        self.precision = "int8_chained"
        self.factor = chain.factor
        self.bgr_to_rgb = bgr_to_rgb
        # fold: batch-phase factor (2 for b16-64 serving; 1 = unfolded, the
        # b128 winner — chained int8 4757 vs bf16 4417 img/s on v5e).
        # Chains that don't fold (detr: C ≥ 256 everywhere, lanes already
        # full) declare `folds`; requests outside it clamp to the max.
        # enter: "stem" chains from the first conv; "m3" is the generic
        # hybrid-entry token — the model leaves its large-grid/small-C
        # prefix bf16 (XLA s8 layout oscillation there, see
        # models/yolo11.apply_chain, models/resnet.backbone_chain).
        folds = getattr(chain, "folds", (1, 2))
        if fold not in folds:
            fold = max(folds)
        self.fold, self.enter = fold, enter
        # pallas: None → per-shape auto (fused in-kernel-requant Mosaic
        # convs on TPU, ops/pallas/qconv.py); False forces the XLA chain
        # lowering (A/B and CPU-mesh runs); "interpret" for tests.
        self.pallas = pallas
        h, w, c = model.input_shape(cfg)
        if c != 3:
            # input_shape is already a g×g space-to-depth tensor (detr's
            # s2d2 contract): recover the full-res frame dims
            g = int(round((c / 3) ** 0.5))
            assert 3 * g * g == c, f"non-RGB input shape {(h, w, c)}"
            h, w = h * g, w * g
        self._dst = (h, w)
        dtype = jnp.bfloat16

        def _ctx(mode, **kw):
            return qchain.ChainCtx(mode, enter=enter, pallas=self.pallas,
                                   **kw)

        # 1. collect conv weights: one eager tap pass on CPU (B=2 zeros —
        # the fold needs an even batch; weights are input-independent)
        params_np = jax.tree.map(np.asarray, engine.params)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params_cpu = jax.tree.map(jnp.asarray, params_np)
            ctx = _ctx("tap")
            x0 = jnp.zeros((2, h // self.factor, w // self.factor,
                            3 * self.factor * self.factor), dtype)
            chain(params_cpu, x0, cfg, ctx, f=fold if fold > 1 else 1)
        self.n_scales = ctx.n_scales
        self.wq, self.sw = qchain.quantize_chain_weights(
            [np.asarray(wt) for wt in ctx.ws], ctx.w_is_dw)
        self.act_scales: Optional[np.ndarray] = None

        def tap_fused(params, frames, src_hw):
            x4 = letterbox_s2d_batch(frames, src_hw, h, w,
                                     bgr_to_rgb=bgr_to_rgb, out_dtype=dtype,
                                     factor=self.factor)
            c = _ctx("tap")
            chain(params, x4, cfg, c, f=fold)
            return c.taps

        self._tap_jit = jax.jit(tap_fused)

        def run_fused(params, wq, scales, frames, src_hw):
            x4 = letterbox_s2d_batch(frames, src_hw, h, w,
                                     bgr_to_rgb=bgr_to_rgb, out_dtype=dtype,
                                     factor=self.factor)
            c = _ctx("run", scales=scales, wq=wq, sw=self.sw)
            return chain(params, x4, cfg, c, f=fold)

        self._run_fused = run_fused
        self._jitted = jax.jit(run_fused)

    def calibrate(self, frame_batches: Iterable[np.ndarray]) -> np.ndarray:
        """frame_batches: uint8 (B, srcH, srcW, 3) arrays, B even ≥ 2."""
        absmax = None
        for fr in frame_batches:
            self._check_batch(fr)
            b, sh, sw_, _ = fr.shape
            hw = jnp.tile(jnp.asarray([[sh, sw_]], jnp.int32), (b, 1))
            taps = self._tap_jit(self.engine.params,
                                 jnp.asarray(fr, jnp.uint8), hw)
            cur = np.array([np.asarray(t) for t in taps])
            absmax = cur if absmax is None else np.maximum(absmax, cur)
        if absmax is None:
            raise ValueError(
                "calibrate() received no frame batches — pass at least one "
                "uint8 (B, H, W, 3) array with B even and >= 2")
        self.act_scales = np.maximum(absmax / 127.0, 1e-8).astype(np.float32)
        return self.act_scales

    def _check_batch(self, fr) -> None:
        if fr.ndim != 4 or fr.shape[-1] != 3:
            raise ValueError(f"expected (B, H, W, 3) uint8 frames, got "
                             f"shape {tuple(fr.shape)}")
        b = fr.shape[0]
        if b < max(self.fold, 1) or b % max(self.fold, 1) != 0:
            raise ValueError(
                f"frame batch size {b} must be >= {self.fold} and divisible "
                f"by the batch-fold factor {self.fold} (batch_fold reshape)")

    def serve_args(self):
        """(params, wq, scales) leading args for the traceable serving fn."""
        assert self.act_scales is not None, "call calibrate() first"
        return (self.engine.params, self.wq, jnp.asarray(self.act_scales))

    def raw_serve(self, params, wq, scales, frames, src_hw):
        """Traceable uint8-frames → detections chain forward."""
        return self._run_fused(params, wq, scales, frames, src_hw)

    def __call__(self, frames, src_hw=None):
        frames = jnp.asarray(frames, jnp.uint8)
        self._check_batch(frames)
        if src_hw is None:
            b = frames.shape[0]
            src_hw = jnp.tile(jnp.asarray(
                [[frames.shape[1], frames.shape[2]]], jnp.int32), (b, 1))
        return self._jitted(*self.serve_args(), frames,
                            jnp.asarray(src_hw, jnp.int32))

    def save(self, path: str) -> None:
        if self.act_scales is None:
            raise ValueError("save() before calibrate(): the chained engine "
                             "has no activation scales to serialize")
        self.engine.save(path)
        save_scale_cache(os.path.join(path, "int8chain.json"),
                         self.act_scales,
                         {"model": self.name, "tier": "chained",
                          "fold": self.fold, "enter": self.enter,
                          "bgr_to_rgb": self.bgr_to_rgb})

    @staticmethod
    def load(path: str) -> "ChainedInt8Engine":
        eng = Engine.load(path)
        with open(os.path.join(path, "int8chain.json")) as fh:
            meta = json.load(fh).get("meta", {})
        ce = ChainedInt8Engine(eng, bgr_to_rgb=meta.get("bgr_to_rgb", False),
                               fold=meta.get("fold", 2),
                               enter=meta.get("enter", "m3"))
        ce.act_scales = load_scale_cache(
            os.path.join(path, "int8chain.json"))
        return ce


def _conv_weights(engine: Engine) -> List[np.ndarray]:
    """Conv weights in trace order (same spy as weight_scales)."""
    model, cfg = engine.model, engine.cfg
    ws: List[np.ndarray] = []
    import tensorrtx_tpu.ops.nn as _nn
    from tensorrtx_tpu.ops import quant_ctx

    orig_conv = _nn.conv2d

    def conv_spy(x, w, b=None, **kw):
        ws.append(np.asarray(w))
        return orig_conv(x, w, b, **kw)

    # phase-space convs inside model.apply (conv2d_s2dh / _exit) don't go
    # through nn.conv2d; their weight builders report the original HWIO
    # kernel via quant_ctx.WEIGHT_SPY so trace-order indices stay aligned
    _nn.conv2d = conv_spy
    quant_ctx.WEIGHT_SPY = ws
    try:
        h, w_, c = model.input_shape(cfg)
        model.apply(engine.params, jnp.zeros((1, h, w_, c), jnp.float32), cfg)
    finally:
        _nn.conv2d = orig_conv
        quant_ctx.WEIGHT_SPY = None
    return ws
