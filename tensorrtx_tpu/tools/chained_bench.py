"""Chained-int8 vs bf16 serving A/B per model (PERF.md §INT8 rows).

For every model with an `apply_chain` mirror this measures, on the real
chip, the same uint8→outputs serving graph in both tiers:

  - bf16: `ServingPipeline._jitted` (fused letterbox + network + decode)
  - chained int8: `ChainedInt8Engine.raw_serve` (fused letterbox_s2d +
    int8-resident chain — activations cross HBM as int8, ops/qchain.py)

so the per-batch winner table in PERF.md §INT8 regenerates with the code
(the analog of the reference's per-precision latency columns, e.g.
yolov9/README.md:42, detr/README.md:86).

Run:  python -m tensorrtx_tpu.tools.chained_bench [model[,model...]]
Emits one JSON line: {model: {batch: {"bf16_ips":..., "int8_ips":...}}}
"""

from __future__ import annotations

import dataclasses
import json
import sys

import numpy as np

# (model, cfg overrides, [(batch, fold, n_bufs)], enter)
CASES = [
    ("yolo11", {"scale": "n"}, [(32, 2, 8), (128, 1, 3)], "m3"),
    ("yolov5", {"scale": "n", "postprocess": "nms"},
     [(32, 2, 8), (128, 1, 3)], "m3"),
    ("yolov8", {"scale": "n"}, [(32, 2, 8), (128, 1, 3)], "m3"),
    # DETR: 800² frames, no batch fold (C ≥ 256 through the chained
    # region); the reference's int8 row is batch 1 (detr/README.md:86)
    ("detr", {"input_h": 800, "input_w": 800, "input_format": "s2d2"},
     [(1, 1, 4), (8, 1, 4)], "m3"),
    # yolov9-c: the reference's canonical int8 table is batch-1 fp16-vs-
    # int8 (yolov9/README.md:42); C >= 256 through the chain, no fold
    ("yolov9", {"postprocess": "nms"}, [(1, 1, 4), (32, 1, 8)], "m3"),
]


def _build(name, over):
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model(name)
    cfg = dataclasses.replace(model.default_cfg(), **over)
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    return Engine(name, params, cfg, "bf16")


def _median_iter_ms(fn, args_list, reps=3):
    from tensorrtx_tpu.core.runner import bench_marginal

    vals = [bench_marginal(fn, args_list, n_small=5, n_large=20)["iter_ms"]
            for _ in range(reps)]
    return float(np.median(vals))


def bench_model(name, over, batches, enter):
    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.quant import ChainedInt8Engine
    from tensorrtx_tpu.core.runner import ServingPipeline

    eng = _build(name, over)
    cfg = eng.cfg
    h, w, c = eng.model.input_shape(cfg)
    if c != 3:  # s2d input contract: recover full-res frame dims
        g = int(round((c / 3) ** 0.5))
        h, w = h * g, w * g
    rng = np.random.default_rng(0)
    out = {}
    pipe = ServingPipeline(eng, src_h=h, src_w=w, donate=False)
    cal = rng.integers(0, 255, (8, h, w, 3)).astype(np.uint8)
    for batch, fold, nbuf in batches:
        row = {}
        hwv = jnp.asarray(np.tile([[h, w]], (batch, 1)), jnp.int32)
        bufs = [jax.device_put(jnp.asarray(
            rng.integers(0, 255, (batch, h, w, 3), np.uint8)))
            for _ in range(nbuf)]
        if batch == 1:
            # stream-scan so the number is chip time, not relay RPC
            K = 8
            sfrm = [jax.device_put(jnp.asarray(
                rng.integers(0, 255, (K, h, w, 3), np.uint8)))
                for _ in range(4)]
            shw = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (K, 1))
            fn = pipe.stream_fn(K)
            ms = _median_iter_ms(fn, [(pipe._params, f, shw) for f in sfrm])
            row["bf16_ms_per_img"] = round(ms / K, 4)
            ce = ChainedInt8Engine(eng, fold=fold, enter=enter)
            ce.calibrate([cal[:2]])
            p_, wq_, sc_ = ce.serve_args()

            def cstream(params, wq, scales, frames, src_hw):
                def body(carry, fr_hw):
                    fr, hw1 = fr_hw
                    o = ce.raw_serve(params, wq, scales, fr[None], hw1[None])
                    s = sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree.leaves(o))
                    return carry + s, None
                acc, _ = jax.lax.scan(body, jnp.float32(0),
                                      (frames, src_hw))
                return acc

            cfn = jax.jit(cstream)
            shw1 = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (K, 1))
            ms = _median_iter_ms(cfn, [(p_, wq_, sc_, f, shw1)
                                       for f in sfrm])
            row["int8_ms_per_img"] = round(ms / K, 4)
        else:
            ms = _median_iter_ms(pipe._jitted,
                                 [(pipe._params, b, hwv) for b in bufs])
            row["bf16_ips"] = round(batch / ms * 1e3, 1)
            ce = ChainedInt8Engine(eng, fold=fold, enter=enter)
            ce.calibrate([cal])
            cfn = jax.jit(ce.raw_serve)
            p_, wq_, sc_ = ce.serve_args()
            ms = _median_iter_ms(cfn, [(p_, wq_, sc_, b, hwv) for b in bufs])
            row["int8_ips"] = round(batch / ms * 1e3, 1)
        out[batch] = row
        print(f"# {name} b{batch}: {row}", file=sys.stderr)
    return out


def main():
    import os

    from tensorrtx_tpu.core.engine import enable_persistent_cache

    enable_persistent_cache(os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".bench_xla_cache"))
    sel = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    res = {}
    for name, over, batches, enter in CASES:
        if sel is not None and name not in sel:
            continue
        key = name if name not in res else f"{name}:{len(res)}"
        try:
            res[key] = bench_model(name, over, batches, enter)
        except Exception as exc:  # noqa: BLE001 - record and continue
            print(f"# {name}: FAILED {exc}", file=sys.stderr)
            res[key] = {"error": str(exc)[:200]}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
