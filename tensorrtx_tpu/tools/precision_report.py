"""Empirical precision-support probe for the attached TPU.

The analog of the reference's tutorials/check_fp16_int8_support.md — but
where that page tells you to look up your GPU's compute capability in a
table, a TPU's effective tier support is a property of the XLA lowering,
so this probes it EMPIRICALLY on the attached chip:

  1. per-dtype matmul probe: does a jitted dot compile+run in this tier,
     and at what measured TF/s (2048³ matmul, scan-streamed so the number
     is chip time, not dispatch RPC)
  2. the conv-tier crossover table (PERF.md §INT8): bf16 vs int8-resident
     chained convs at the serving hot shapes — which tier wins where

Run:  python -m tensorrtx_tpu.cli precision-report [--json] [--quick]
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

M = 2048  # probe matmul size (--quick: 512, for CPU/CI smoke)


def _stream_ms(fn, args, K: int = 8) -> float:
    """Median chip-time ms/call of fn(*args), streamed K-per-dispatch."""
    from jax import lax

    from tensorrtx_tpu.core.runner import bench_marginal

    x0, rest = args[0], args[1:]
    xs = jnp.broadcast_to(x0[None], (K,) + x0.shape)

    def stream(xs_, *a):
        def body(c, x):
            return c + jnp.sum(fn(x, *a).astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.float32(0), xs_)
        return acc

    sfn = jax.jit(stream)
    vals = [bench_marginal(sfn, [(xs,) + tuple(rest)] * 2,
                           n_small=3, n_large=8)["iter_ms"] / K
            for _ in range(3)]
    return float(np.median(vals))


def probe_dtype(tag: str, in_dtype, acc_dtype, m: int = M) -> dict:
    """One tier: compile+run an m³ matmul; ok/error + measured TF/s."""
    rng = np.random.default_rng(0)
    try:
        if in_dtype == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
            bm = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
        else:
            a = jnp.asarray(rng.normal(0, 1, (m, m)), in_dtype)
            bm = jnp.asarray(rng.normal(0, 1, (m, m)), in_dtype)

        def mm(x, y):
            return jax.lax.dot(x, y, preferred_element_type=acc_dtype)

        ms = _stream_ms(mm, (a, bm))
        tf_s = 2 * m ** 3 / ms / 1e9
        return {"tier": tag, "supported": True,
                "ms": round(ms, 4), "tf_s": round(tf_s, 1)}
    except Exception as exc:  # noqa: BLE001 — report, don't crash the probe
        return {"tier": tag, "supported": False,
                "error": f"{type(exc).__name__}: {str(exc)[:200]}"}


def dtype_table(quick: bool = False) -> list:
    m = 512 if quick else M
    tiers = [
        ("fp32", jnp.float32, jnp.float32),
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8 (s8×s8→s32)", jnp.int8, jnp.int32),
    ]
    for name in ("float8_e4m3fn", "float8_e5m2"):
        dt = getattr(jnp, name, None)
        if dt is not None:
            tiers.append((f"fp8 ({name})", dt, jnp.float32))
    return [probe_dtype(t, d, a, m=m) for t, d, a in tiers]


def crossover_table(quick: bool = False) -> list:
    """bf16 vs int8-resident conv chains at the serving hot shapes —
    the measured which-tier-wins-where table (tools/int8_microbench)."""
    from tensorrtx_tpu.tools import int8_microbench as mb

    rows = []
    shapes = mb.SHAPES[:2] if quick else mb.SHAPES
    rng = np.random.default_rng(0)
    n = mb.N_LAYERS
    for tag, B, H, W, C in shapes:
        x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.1, (n, 3, 3, C, C)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 0.1, (n, C)), jnp.bfloat16)
        sw = jnp.asarray(np.abs(np.asarray(w, np.float32)).max(
            axis=(1, 2, 3)) / 127.0)
        sx = jnp.full((n,), 1.0 / 127.0, jnp.float32)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32)
                                / sw[:, None, None, None, :]),
                      -127, 127).astype(jnp.int8)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 127), -127,
                      127).astype(jnp.int8)
        t_bf = mb.bench(functools.partial(mb.chain_bf16, n=n), (x, w, b))
        t_i8 = mb.bench(functools.partial(mb.chain_int8_resident, n=n),
                        (xq, wq, b.astype(jnp.float32), sx, sw))
        rows.append({"shape": tag, "B": B, "HxW": f"{H}x{W}", "C": C,
                     "bf16_ms": round(t_bf, 4),
                     "int8_resident_ms": round(t_i8, 4),
                     "int8_vs_bf16": round(t_bf / t_i8, 3),
                     "winner": "int8" if t_i8 < t_bf else "bf16"})
    return rows


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    as_json = "--json" in argv
    quick = "--quick" in argv
    dev = jax.devices()[0]
    report = {
        "device": {"platform": dev.platform,
                   "kind": getattr(dev, "device_kind", "?"),
                   "n_devices": len(jax.devices())},
        "tiers": dtype_table(quick=quick),
        "conv_crossover": crossover_table(quick=quick),
    }
    if as_json:
        print(json.dumps(report, indent=1))
        return 0
    d = report["device"]
    print(f"device: {d['kind']} ({d['platform']}, {d['n_devices']} visible)")
    print("\n## tier support (matmul probe)\n")
    print("| tier | supported | ms | TF/s |")
    print("|---|---|---|---|")
    for r in report["tiers"]:
        if r["supported"]:
            print(f"| {r['tier']} | yes | {r['ms']} | {r['tf_s']} |")
        else:
            print(f"| {r['tier']} | NO ({r['error'][:60]}) | - | - |")
    print("\n## conv tier crossover (8-layer conv+SiLU chains, serving "
          "shapes)\n")
    print("| shape | B | HxW | C | bf16 ms | int8-resident ms | int8/bf16 "
          "| winner |")
    print("|---|---|---|---|---|---|---|---|")
    for r in report["conv_crossover"]:
        print(f"| {r['shape']} | {r['B']} | {r['HxW']} | {r['C']} | "
              f"{r['bf16_ms']} | {r['int8_resident_ms']} | "
              f"{r['int8_vs_bf16']}x | {r['winner']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
