"""Benchmark: YOLO11n 640×640 end-to-end images/sec/chip (BASELINE.json).

Measures the fused serving pipeline (uint8 frames → letterbox → network →
decode → top-k → NMS → fixed detection buffer), batch 1 and 32.

Two numbers per batch:
  - steady-state throughput (marginal ms/iter with the device queue kept
    full — what a chip sustains serving a request stream),
  - per-call p50 latency including a host fetch (this environment reaches
    the chip through a network relay, so per-call latency has a ~30 ms
    constant that is relay RTT, not TPU time).

Prints ONE JSON line. vs_baseline compares batch-1 steady-state throughput
against an estimated TensorRT-on-A100 YOLO11n end-to-end figure (~1050
img/s; the reference publishes no A100 number — see BASELINE.md).
"""

import json
import sys

import numpy as np

TRT_A100_YOLO11N_E2E_IPS = 1050.0


def main():
    import os

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_yolo11
    from tensorrtx_tpu.core.engine import enable_persistent_cache
    from tensorrtx_tpu.core.runner import ServingPipeline, bench_loop, bench_marginal

    # first compile of the stream program can take minutes through a remote
    # -compile relay; the persistent cache makes reruns start in seconds
    enable_persistent_cache(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), ".bench_xla_cache"))

    eng = _build_yolo11(scale="n", h=640, w=640, precision="bf16", max_det=300)
    results = {}
    rng = np.random.default_rng(0)

    # batch 1: stream-scan steady state. Each frame runs the batch-1
    # program; a lax.scan over K frames amortizes the per-dispatch relay
    # RPC (~0.2-1 ms through the axon tunnel, does NOT pipeline) that a
    # locally-driven chip never pays. Per-dispatch marginals were measuring
    # relay jitter, not TPU time (r1: 908 img/s reported, ~980 on-device).
    pipe = ServingPipeline(eng, src_h=640, src_w=640, donate=False)
    K = 16
    stream = pipe.stream_fn(K)
    hw = jnp.asarray(np.tile([[640, 640]], (K, 1)), jnp.int32)
    frames = [jax.device_put(jnp.asarray(
        rng.integers(0, 255, (K, 640, 640, 3), np.uint8))) for _ in range(4)]
    args = [(pipe._params, f, hw) for f in frames]
    reps = [bench_marginal(stream, args, n_small=10, n_large=50)["iter_ms"]
            for _ in range(3)]
    iter_ms = float(np.median(reps)) / K
    lat = bench_loop(pipe._jitted,
                     [(pipe._params, f[:1], hw[:1]) for f in frames],
                     iters=20, warmup=3)
    results[1] = {"iter_ms": iter_ms, "ips": 1e3 / iter_ms,
                  "call_p50_ms": lat["p50_ms"]}
    # honest single-request latency: device execution time from the
    # profiler trace (the host-side p50 above is ~30 ms of relay RTT)
    try:
        from tensorrtx_tpu.core.profiler import device_p50_ms

        results[1]["device_p50_ms"] = device_p50_ms(
            pipe._jitted, [(pipe._params, f[:1], hw[:1]) for f in frames])
    except Exception as e:
        print(f"# device p50 skipped: {e}", file=sys.stderr)
        results[1]["device_p50_ms"] = None
    print(f"# batch=1: {iter_ms:.3f} ms/img stream steady-state "
          f"({1e3 / iter_ms:.1f} img/s), per-call p50 {lat['p50_ms']:.1f} ms"
          f" (device p50 {results[1]['device_p50_ms']} ms)",
          file=sys.stderr)

    # batch 32 (the reference comparison point) and 128 (throughput knee):
    # per-dispatch marginal — the batch amortizes the relay RPC
    for batch in (32, 128):
        try:
            src_hw = jnp.asarray(np.tile([[640, 640]], (batch, 1)), jnp.int32)
            nbuf = 8 if batch <= 32 else 3
            bufs = [jax.device_put(jnp.asarray(
                rng.integers(0, 255, (batch, 640, 640, 3), np.uint8)))
                for _ in range(nbuf)]
            args = [(pipe._params, b, src_hw) for b in bufs]
            fn = pipe._jitted
            reps = [bench_marginal(fn, args, n_small=10, n_large=40)["iter_ms"]
                    for _ in range(3)]
            marg = {"iter_ms": float(np.median(reps))}
            lat = bench_loop(fn, args, iters=10, warmup=3)
            ips = batch / (marg["iter_ms"] / 1e3)
            results[batch] = {"iter_ms": marg["iter_ms"], "ips": ips,
                              "call_p50_ms": lat["p50_ms"]}
            print(f"# batch={batch}: {marg['iter_ms']:.3f} ms/iter "
                  f"steady-state ({ips:.1f} img/s), per-call p50 "
                  f"{lat['p50_ms']:.1f} ms", file=sys.stderr)
        except Exception as e:  # the b32 headline must survive a b128 OOM
            if batch == 32:
                raise
            print(f"# batch={batch} skipped: {e}", file=sys.stderr)

    # int8 float-resident tier (≙ TRT's per-layer Q/DQ fallback): loses to
    # bf16 on v5e — every conv pays a standalone quantize pass. The
    # chained int8-RESIDENT tier below is the real int8 formulation
    # (PERF.md §INT8).
    int8_res = {}
    try:
        from tensorrtx_tpu.core.quant import QuantizedEngine, calibrate

        cal = [np.random.default_rng(7).uniform(0, 1, (4, 640, 640, 3))
               .astype(np.float32) for _ in range(4)]
        q = QuantizedEngine(eng, calibrate(eng, cal, method="absmax"))
        qpipe = ServingPipeline(q, src_h=640, src_w=640, donate=False)
        qstream = qpipe.stream_fn(K)
        qargs = [(qpipe._params, f, hw) for f in frames]
        reps = [bench_marginal(qstream, qargs, n_small=10,
                               n_large=50)["iter_ms"] for _ in range(3)]
        int8_res["batch1_iter_ms"] = round(float(np.median(reps)) / K, 3)
        src_hw32 = jnp.asarray(np.tile([[640, 640]], (32, 1)), jnp.int32)
        bufs32 = [jax.device_put(jnp.asarray(rng.integers(
            0, 255, (32, 640, 640, 3), np.uint8))) for _ in range(8)]
        reps = [bench_marginal(qpipe._jitted,
                               [(qpipe._params, b, src_hw32) for b in bufs32],
                               n_small=10, n_large=40)["iter_ms"]
                for _ in range(3)]
        int8_res["batch32_iter_ms"] = round(float(np.median(reps)), 3)
        int8_res["batch32_ips"] = round(
            32e3 / int8_res["batch32_iter_ms"], 1)
        print(f"# int8 (float-resident): b1 {int8_res['batch1_iter_ms']} "
              f"ms/img, b32 {int8_res['batch32_ips']} img/s", file=sys.stderr)
    except Exception as e:
        print(f"# int8 bench skipped: {e}", file=sys.stderr)

    # chained int8 tier (int8-RESIDENT activations, ops/qchain.py): the
    # b128 winner on v5e — beats bf16 there; at b32 the s8 layout
    # oscillation at small-C stages keeps bf16 ahead (PERF.md §INT8)
    try:
        from tensorrtx_tpu.core.quant import ChainedInt8Engine

        cal = rng.integers(0, 255, (8, 640, 640, 3)).astype(np.uint8)
        for fold, batch, nbuf in ((2, 32, 8), (1, 128, 3)):
            ce = ChainedInt8Engine(eng, fold=fold, enter="m3")
            ce.calibrate([cal])
            cfn = jax.jit(ce.raw_serve)
            chw = jnp.asarray(np.tile([[640, 640]], (batch, 1)), jnp.int32)
            cbufs = [jax.device_put(jnp.asarray(rng.integers(
                0, 255, (batch, 640, 640, 3), np.uint8)))
                for _ in range(nbuf)]
            p_, wq_, sc_ = ce.serve_args()
            reps = [bench_marginal(cfn, [(p_, wq_, sc_, b, chw)
                                         for b in cbufs],
                                   n_small=10, n_large=40)["iter_ms"]
                    for _ in range(3)]
            ms = float(np.median(reps))
            int8_res[f"chained_batch{batch}_iter_ms"] = round(ms, 3)
            int8_res[f"chained_batch{batch}_ips"] = round(batch / ms * 1e3, 1)
            print(f"# int8 chained (fold={fold}): b{batch} "
                  f"{int8_res[f'chained_batch{batch}_ips']} img/s",
                  file=sys.stderr)
    except Exception as e:
        print(f"# chained int8 bench skipped: {e}", file=sys.stderr)

    # secondary headline benchmarks vs the reference's published latencies
    # (BASELINE.md: DETR-R50 b1 19.57 ms fp32 / 9.42 ms fp16 on 2080Ti;
    #  UNet 816x672-ish 14 ms fp16 bs8 → 1.75 ms/img)
    secondary = {}
    try:
        import dataclasses as _dc

        from tensorrtx_tpu.core.random_weights import RandomWeightMap
        from tensorrtx_tpu.core.registry import get_model
        from tensorrtx_tpu.core.engine import Engine

        def _rand_engine(name, **over):
            model = get_model(name)
            cfg = _dc.replace(model.default_cfg(), **over)
            params = model.build_params(RandomWeightMap(), cfg)
            params = jax.tree.map(
                lambda a: jnp.asarray(a, jnp.bfloat16)
                if np.issubdtype(np.asarray(a).dtype, np.floating)
                else jnp.asarray(a), params)
            return Engine(name, params, cfg, "bf16")

        for name, over, b, ref_ms in (
                ("detr", dict(input_h=800, input_w=800, input_format="s2d2"), 1, 9.42),
                ("unet", dict(input_h=640, input_w=960, num_classes=2), 8,
                 14.0)):
            e = _rand_engine(name, **over)
            h, w, c = e.model.input_shape(e.cfg)
            xs = [jax.device_put(jnp.asarray(
                np.random.default_rng(i).uniform(-1, 1, (b, h, w, c)),
                jnp.bfloat16)) for i in range(4)]
            m = bench_marginal(lambda x, e=e: e._jitted(e.params, x),
                               [(x,) for x in xs], 5, 25)
            per_img = m["iter_ms"] / b
            secondary[name] = {
                "batch": b, "iter_ms": round(m["iter_ms"], 3),
                "per_image_ms": round(per_img, 3),
                "ref_trt_per_image_ms": ref_ms,
                "speedup_vs_ref": round(ref_ms / max(per_img, 1e-6), 2),
            }
            print(f"# {name} b{b}: {per_img:.2f} ms/img "
                  f"(ref TRT {ref_ms} ms/img)", file=sys.stderr)
    except Exception as e:  # secondary benches must never break the headline
        print(f"# secondary bench skipped: {e}", file=sys.stderr)

    ips1 = results[1]["ips"]
    # MFU: YOLO11n-640 forward ≈ 6.5 GFLOP/img (ultralytics reports
    # 6.5 GFLOPs); v5e bf16 peak 197 TFLOP/s
    mfu1 = ips1 * 6.5e9 / 197e12
    print(json.dumps({
        "metric": "yolo11n 640x640 e2e (preprocess+infer+decode+NMS) images/sec/chip, batch1 steady-state",
        "value": round(ips1, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips1 / TRT_A100_YOLO11N_E2E_IPS, 3),
        "extra": {
            "batch1_iter_ms": round(results[1]["iter_ms"], 3),
            "batch1_call_p50_ms_via_relay": round(results[1]["call_p50_ms"], 1),
            "batch32_ips": round(results[32]["ips"], 1),
            "batch32_iter_ms": round(results[32]["iter_ms"], 3),
            "batch128_ips": round(results[128]["ips"], 1)
            if 128 in results else None,
            "batch1_mfu_pct": round(mfu1 * 100, 2),
            "batch32_mfu_pct": round(
                results[32]["ips"] * 6.5e9 / 197e12 * 100, 2),
            "batch1_device_p50_ms": results[1]["device_p50_ms"],
            "int8": int8_res,
            "baseline": "TRT-A100 yolo11n e2e est. 1050 img/s (no in-repo number; BASELINE.md)",
            "secondary_vs_published": secondary,
        },
    }))


if __name__ == "__main__":
    main()
