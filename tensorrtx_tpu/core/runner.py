"""Serving runner — the L4 inference driver loop, TPU-style.

The reference's loop (yolo11/yolo11_det.cpp:218-252) is:
  imread → pinned-host staging → H2D → preprocess kernel → enqueueV2 →
  decode/NMS kernels → D2H → CPU finishing.

Here the entire device side is ONE jitted XLA program
(letterbox → network → decode → top-k → NMS): the host hands over raw uint8
frames and receives a fixed-size detection buffer. Host work is only image
decode (PIL) and box-to-original-image rescaling.
"""

from __future__ import annotations

import time
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorrtx_tpu.core.engine import Engine
from tensorrtx_tpu.ops.preprocess import (letterbox_batch, letterbox_s2d_batch,
                                          scale_boxes_back)

__all__ = ["ServingPipeline", "load_image", "read_files_in_dir"]


def _param_dtype(params):
    for leaf in jax.tree.leaves(params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.dtype
    return jnp.float32


class ServingPipeline:
    """uint8 frames → detections, fully fused on device.

    Frames share one static source bucket (src_h, src_w); images smaller than
    the bucket sit in the top-left corner with their true (h, w) passed as
    data — one compiled program serves every image that fits (the TPU answer
    to TensorRT optimization profiles).
    """

    def __init__(self, engine: Engine, src_h: int, src_w: int,
                 bgr_to_rgb: bool = False, donate: bool = True):
        self.engine = engine
        self.src_h, self.src_w = src_h, src_w
        cfg = engine.cfg
        dst_h, dst_w = cfg.input_h, cfg.input_w
        model = engine.model
        dtype = _param_dtype(engine.params)

        # Fast path: models exposing apply_s2d consume the letterboxed
        # space-to-depth parity tensor directly — same numerics, no
        # batch-1 first-conv relayout copies (see ops/preprocess.py).
        # Int8 engines route through raw_apply_s2d so their quant context
        # stays aligned (the s2d stem convs consume the standard path's
        # scales — an s2d tensor is a pixel permutation of the input).
        s2d = engine.model.apply_s2d
        s2d_factor = getattr(s2d, "factor", 2) if s2d is not None else 0
        use_s2d = (s2d is not None
                   and getattr(s2d, "supports", lambda c: True)(engine.cfg)
                   and dst_h % max(s2d_factor, 1) == 0
                   and dst_w % max(s2d_factor, 1) == 0)

        def fused(params, frames, src_hw):
            if use_s2d:
                x2 = letterbox_s2d_batch(frames, src_hw, dst_h, dst_w,
                                         bgr_to_rgb=bgr_to_rgb,
                                         out_dtype=dtype,
                                         factor=s2d_factor)
                if engine.precision == "int8":
                    return engine.raw_apply_s2d(params, x2)
                return engine.model.apply_s2d(params, x2, engine.cfg)
            x = letterbox_batch(frames, src_hw, dst_h, dst_w,
                                bgr_to_rgb=bgr_to_rgb)
            x = x.astype(dtype)
            # raw_apply so int8 QuantizedEngines keep their quant context
            return engine.raw_apply(params, x)

        self._jitted = jax.jit(fused, donate_argnums=(1,) if donate else ())
        self._fused = fused  # traceable; bench/stream wrappers re-jit it
        self._params = engine.params

    def stream_fn(self, k: int):
        """Jitted scan over k frames, each processed at batch 1.

        Serving a request stream one image at a time is the reference's
        serving model (yolo11_det.cpp enqueues per image); on this
        environment every dispatch crosses a network relay (~0.2-1 ms RPC
        that does not pipeline), so benchmarking per-dispatch marginals
        measures the relay, not the chip. The scan keeps the per-image
        batch-1 program but amortizes dispatch over k frames — the number
        a locally-driven chip sustains.

        Returns fn(params, frames (k,H,W,3) u8, src_hw (k,2)) → stacked outs.
        """

        def stream(params, frames, src_hw):
            def body(_, fr_hw):
                fr, hw = fr_hw
                return None, self._fused(params, fr[None], hw[None])

            _, outs = jax.lax.scan(body, None, (frames, src_hw))
            return outs

        return jax.jit(stream)

    def __call__(self, frames: np.ndarray, src_hw: Optional[np.ndarray] = None):
        if src_hw is None:
            b = frames.shape[0]
            src_hw = np.tile([[frames.shape[1], frames.shape[2]]], (b, 1))
        return self._jitted(self._params, jnp.asarray(frames, jnp.uint8),
                            jnp.asarray(src_hw, jnp.int32))

    def warmup(self, batch: int = 1):
        frames = np.zeros((batch, self.src_h, self.src_w, 3), np.uint8)
        out = self(frames)
        jax.block_until_ready(out)
        return out

    def detect_images(self, images: Sequence[np.ndarray]):
        """Convenience host API: list of HWC uint8 images (any size ≤ bucket)
        → per-image detections mapped back to original pixel coords."""
        b = len(images)
        frames = np.zeros((b, self.src_h, self.src_w, 3), np.uint8)
        src_hw = np.zeros((b, 2), np.int32)
        for i, im in enumerate(images):
            h, w = im.shape[:2]
            frames[i, :h, :w] = im
            src_hw[i] = (h, w)
        out = self(frames, src_hw)
        return present_detections(out, src_hw, self.engine.cfg)[:b]


def present_detections(out, src_hw, cfg):
    """Detection buffer (boxes/scores/classes/count) → per-image host dicts
    with boxes mapped back to original pixel coords. Shared by
    ServingPipeline.detect_images and the mesh serving path (parallel/)."""
    d = out if isinstance(out, dict) else out.as_dict()
    results = []
    for i in range(np.asarray(d["count"]).shape[0]):
        n = int(d["count"][i])
        bx = np.asarray(scale_boxes_back(
            jnp.asarray(d["boxes"][i][:n]), src_hw[i, 0], src_hw[i, 1],
            cfg.input_h, cfg.input_w))
        results.append({
            "boxes": bx,
            "scores": np.asarray(d["scores"][i][:n]),
            "classes": np.asarray(d["classes"][i][:n]),
        })
    return results


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def read_files_in_dir(path: str, exts=(".jpg", ".jpeg", ".png", ".bmp", ".pgm", ".ppm")):
    """Reference utils.h read_files_in_dir analog."""
    import os

    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(exts))


def _force(out):
    """Truly materialize a result: fetch a (tiny) leaf to host.

    jax.block_until_ready can return early through remote-execution relays,
    so timing must anchor on an actual D2H fetch.
    """
    leaf = jax.tree.leaves(out)[-1]
    np.asarray(leaf[..., :1] if leaf.ndim else leaf)


def bench_loop(fn, args_list, iters: int = 100, warmup: int = 5) -> dict:
    """Per-call latency: each call is fetched before the next starts
    (reference convention: wall-clock around enqueue + D2H,
    yolo11_det.cpp:91-109; warmup excluded)."""
    for i in range(warmup):
        _force(fn(*args_list[i % len(args_list)]))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args_list[i % len(args_list)]))
        times.append(time.perf_counter() - t0)
    t = np.array(times)
    return {
        "mean_ms": float(t.mean() * 1e3),
        "p50_ms": float(np.percentile(t, 50) * 1e3),
        "p99_ms": float(np.percentile(t, 99) * 1e3),
    }


def bench_marginal(fn, args_list, n_small: int = 20, n_large: int = 120) -> dict:
    """Steady-state device throughput: queue N executions (distinct input
    buffers), force one final fetch, and take the marginal time per extra
    iteration between two queue depths — cancels the fixed host/relay
    round-trip so the number reflects what the chip sustains while serving
    a request stream."""
    _force(fn(*args_list[0]))  # compile + warm

    def run(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(*args_list[i % len(args_list)])
        _force(out)
        return time.perf_counter() - t0

    run(n_small)  # warm the queue path
    t_small = run(n_small)
    t_large = run(n_large)
    per_iter = (t_large - t_small) / (n_large - n_small)
    return {"iter_ms": per_iter * 1e3}
