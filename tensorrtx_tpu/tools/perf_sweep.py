"""Per-model TPU latency sweep vs the reference's published TRT tables.

Produces the measurements behind PERF.md: batch-1 device time per model
(fused graph incl. decode/NMS where the reference's engine embeds the
plugin), measured as a jitted `lax.scan` stream over K frames so the
number is chip time, not the per-dispatch relay RPC unique to this
environment (see BENCH methodology / docs/measure_performance.md).

Run on the real chip:  python -m tensorrtx_tpu.tools.perf_sweep
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np

# (name, cfg overrides, precision, batch, reference ms, reference tag)
CASES = [
    ("yolov9", {"scale": "t", "postprocess": "nms"}, "bf16", 1,
     1.37, "fp16 RTX4060Ti yolov9/README.md:37"),
    ("yolov9", {"scale": "s", "postprocess": "nms"}, "bf16", 1,
     1.78, "fp16 RTX4060Ti yolov9/README.md:39"),
    ("yolov9", {"scale": "m", "postprocess": "nms"}, "bf16", 1,
     2.8, "fp16 RTX4060Ti yolov9/README.md:41"),
    ("yolov9", {"scale": "c", "postprocess": "nms"}, "bf16", 1,
     4.6, "fp16 RTX4060Ti yolov9/README.md:42"),
    ("yolov9", {"scale": "e", "postprocess": "nms"}, "bf16", 1,
     3.2, "fp16 RTX4060Ti yolov9/README.md:43"),
    ("yolov5", {"scale": "n", "postprocess": "nms"}, "bf16", 1,
     0.58, "fp16 RTX4060Ti yolov9/README.md:27"),
    ("yolov5", {"scale": "s", "postprocess": "nms"}, "bf16", 1,
     0.90, "fp16 RTX4060Ti yolov9/README.md:29"),
    ("yolov5", {"scale": "m", "postprocess": "nms"}, "bf16", 1,
     1.9, "fp16 RTX4060Ti yolov9/README.md:31"),
    ("yolov5", {"scale": "l", "postprocess": "nms"}, "bf16", 1,
     2.8, "fp16 RTX4060Ti yolov9/README.md:33"),
    ("yolov5", {"scale": "x", "postprocess": "nms"}, "bf16", 1,
     5.1, "fp16 RTX4060Ti yolov9/README.md:35"),
    ("rcnn", {"task": "det"}, "bf16", 1,
     36.0, "fp16 2080Ti rcnn/README.md:151 (640x480)"),
    ("rcnn", {"task": "mask"}, "bf16", 1,
     44.0, "fp16 2080Ti rcnn/README.md:153 (640x480)"),
    ("rcnn", {"task": "det", "variant": "resnet101"}, "bf16", 1,
     38.0, "fp16 2080Ti rcnn/README.md:152 (640x480, R101-C4)"),
    ("rcnn", {"task": "mask", "variant": "resnet101"}, "bf16", 1,
     45.0, "fp16 2080Ti rcnn/README.md:154 (640x480, R101-C4)"),
    ("detr", {"input_h": 800, "input_w": 800, "input_format": "s2d2"},
     "int8", 1, 8.38, "int8 2080Ti detr/README.md:86"),
    ("efficient_ad", {}, "fp32", 1,
     12.0, "fp32 RTX3080 efficient_ad/README.md:49"),
    ("detr", {"input_h": 800, "input_w": 800, "input_format": "s2d2"}, "bf16", 1,
     9.42, "fp16 2080Ti detr/README.md:86"),
    ("detr", {"variant": "resnet101", "input_h": 800, "input_w": 800,
              "input_format": "s2d2"}, "bf16", 1,
     12.4, "fp16 2080Ti detr/README.md:87"),
    ("unet", {"input_h": 640, "input_w": 960, "num_classes": 2}, "bf16", 8,
     14.0, "fp16 bs8 per-image unet/README.md:56"),
    ("crnn", {"raw_output": True}, "bf16", 1,
     None, "no published number"),
    ("psenet", {}, "fp32", 1,
     30.0, "fp32 Tesla-P40 psenet/README.md:3 (incl. pre/post)"),
    ("vit", {}, "bf16", 1,
     29.67, "profiler total vit/README.md:83 (GPU unstated)"),
    ("yolop", {}, "bf16", 1,
     26.0, "fp16 Jetson-Xavier-NX yolop/README.md:64 (edge device)"),
    ("yolov7", {}, "bf16", 1,
     None, "no published number"),
    ("yolov3", {}, "bf16", 1,
     None, "no published number"),
    ("yolov13", {}, "bf16", 1,
     None, "no published number"),
]


def _engine(name, over, precision):
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.params import resolve_dtype
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model(name)
    cfg = dataclasses.replace(model.default_cfg(), **over)
    params = model.build_params(RandomWeightMap(), cfg)
    dtype = resolve_dtype(precision)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, dtype)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    return Engine(name, params, cfg, precision)


def measure(name, over, precision, batch, reps=3):
    """Stream-scan steady-state ms per call of the fused b=<batch> graph.

    Models with an s2d serving fast path are measured through
    ServingPipeline.stream_fn — the path `cli run` serves them on, with
    letterbox preprocess fused in (strictly MORE work per frame than the
    reference's "pure inference" timings it is compared against)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from tensorrtx_tpu.core.runner import ServingPipeline, bench_marginal

    if precision == "int8":
        # quantized tier (≙ the reference's int8 engines): engine built
        # bf16, absmax-calibrated, convs run int8 MXU dots via quant_ctx
        from tensorrtx_tpu.core.quant import QuantizedEngine, calibrate

        base = _engine(name, over, "bf16")
        hh, ww, cc = base.model.input_shape(base.cfg)
        rng = np.random.default_rng(5)
        cal = [rng.uniform(0, 1, (2, hh, ww, cc)).astype(np.float32)
               for _ in range(2)]
        e = QuantizedEngine(base, calibrate(base, cal, method="absmax"))
    else:
        e = _engine(name, over, precision)
    h, w, c = e.model.input_shape(e.cfg)
    dt = jnp.bfloat16 if precision in ("bf16", "int8") else jnp.float32
    K = 8

    if batch == 1 and c == 3 and e.model.apply_s2d is not None and \
            getattr(e.model.apply_s2d, "supports", lambda _: True)(e.cfg):
        pipe = ServingPipeline(e, h, w, donate=False)
        fn = pipe.stream_fn(K)
        rng = np.random.default_rng(0)
        frames = [jax.device_put(jnp.asarray(
            rng.integers(0, 255, (K, h, w, 3)), jnp.uint8))
            for _ in range(4)]
        hw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (K, 1))
        args = [(pipe._params, fr, hw) for fr in frames]
        vals = [bench_marginal(fn, args, n_small=5, n_large=20)["iter_ms"] / K
                for _ in range(reps)]
        return float(np.median(vals))

    def stream(params, xs):
        def body(carry, x):
            out = e.raw_apply(params, x)
            # fold outputs so nothing accumulates in the scan carry
            leaves = jax.tree.leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return carry + s, None
        acc, _ = lax.scan(body, jnp.float32(0), xs)
        return acc

    fn = jax.jit(stream)
    rng = np.random.default_rng(0)
    xss = [jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (K, batch, h, w, c)), dt)) for _ in range(4)]
    args = [(e.params, x) for x in xss]
    vals = [bench_marginal(fn, args, n_small=5, n_large=20)["iter_ms"] / K
            for _ in range(reps)]
    return float(np.median(vals))


def main():
    import os

    from tensorrtx_tpu.core.engine import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".bench_xla_cache"))
    # optional filter: `perf_sweep yolov5:l,rcnn` runs only matching rows
    # (model name, optionally :<scale-or-variant substring>)
    sel = None
    if len(sys.argv) > 1:
        sel = [s.split(":") for s in sys.argv[1].split(",")]
    rows = []
    for (name, over, precision, batch, ref_ms, tag) in CASES:
        if sel is not None and not any(
                name == s[0] and (len(s) == 1 or s[1] in str(over))
                for s in sel):
            continue
        try:
            ms = measure(name, over, precision, batch)
        except Exception as exc:  # noqa: BLE001 - record and continue
            print(f"# {name} {over}: FAILED {exc}", file=sys.stderr)
            continue
        per_img = ms / batch
        row = {"model": name, "cfg": over, "precision": precision,
               "batch": batch, "ms_per_call": round(ms, 3),
               "ms_per_image": round(per_img, 3), "ref_ms": ref_ms,
               "ref": tag,
               "speedup_vs_ref": (round(ref_ms / per_img, 2)
                                  if ref_ms else None)}
        rows.append(row)
        print(f"# {name} {over} b{batch} {precision}: {per_img:.3f} ms/img"
              + (f"  (ref {ref_ms} ms, {row['speedup_vs_ref']}x)"
                 if ref_ms else ""), file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
