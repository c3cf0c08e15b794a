"""INT8 conv-chain microbenchmark: prove-or-fix for the int8 serving tier.

The reference's int8 engines are its fastest tier (yolov9/README.md:42:
3.0 ms int8 vs 4.6 ms fp16). On v5e our int8 tier measured SLOWER than
bf16 (BENCH_r03). This tool isolates why, by timing a stack of N
conv+bias+SiLU layers at yolo11's hot shapes in three formulations:

  bf16     x:bf16 in HBM -> bf16 conv -> silu -> bf16 out      (4 B/elem)
  int8_f   the current QuantizedEngine path: activations stay
           float in HBM; each conv pays a separate quantize pass
           (read 2B + write 1B) before the int8 dot     (6 B/elem traffic)
  int8_c   chained/int8-resident: conv epilogue requantizes straight
           to the next conv's input scale; activations live in HBM
           as int8                                      (2 B/elem traffic)

If int8_c beats bf16 at the hot shapes, the fix is an int8-resident
serving mode; if it does not, v5e int8 cannot beat bf16 for these
channel-starved convs no matter the software (the MXU pass count is set
by rows/sublanes, not element width), and PERF.md documents that with
these numbers.

Run on the real chip:  python -m tensorrtx_tpu.tools.int8_microbench
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# (tag, B, H, W, C) — yolo11n hot stages (PERF.md batch-scaling profile)
SHAPES = [
    ("p3_b1", 1, 80, 80, 64),
    ("p4_b1", 1, 40, 40, 128),
    ("p3_b32", 32, 80, 80, 64),
    ("p4_b32", 32, 40, 40, 128),
    ("wide_b32", 32, 40, 40, 256),
]
N_LAYERS = 8
DN = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.jit, static_argnames=("n",))
def chain_bf16(x, w, b, n):
    for i in range(n):
        o = lax.conv_general_dilated(x, w[i], (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=DN)
        o = o + b[i]
        x = (o * jax.nn.sigmoid(o)).astype(jnp.bfloat16)
    return x


@functools.partial(jax.jit, static_argnames=("n",))
def chain_int8_float_resident(x, wq, b, sx, sw, n):
    """The current quant path: float activations in HBM, per-conv quantize."""
    for i in range(n):
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx[i]),
                      -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq, wq[i], (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (sx[i] * sw[i])[None, None, None, :] + b[i]
        x = (o * jax.nn.sigmoid(o)).astype(jnp.bfloat16)
    return x


@functools.partial(jax.jit, static_argnames=("n",))
def chain_int8_resident(xq, wq, b, sx, sw, n):
    """Chained int8: epilogue requantizes to the next conv's scale; the
    activation tensor in HBM is int8 end-to-end (half bf16's traffic)."""
    for i in range(n):
        acc = lax.conv_general_dilated(
            xq, wq[i], (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (sx[i] * sw[i])[None, None, None, :] + b[i]
        o = o * jax.nn.sigmoid(o)
        s_next = sx[i + 1] if i + 1 < n else jnp.float32(1.0)
        xq = jnp.clip(jnp.round(o / s_next), -127, 127).astype(jnp.int8)
    return xq


def bench(fn, args, iters=50):
    from tensorrtx_tpu.core.runner import bench_marginal

    # Stream K calls per dispatch so we read chip time, not dispatch RPC.
    # The first arg (the activation) is scanned over a K-stack; because the
    # stack enters the jitted stream as a *traced argument*, the per-step
    # slice is not a loop constant and XLA cannot hoist the chain out of
    # the scan (with the chain as a closed-over constant it did, and the
    # timing read 1 iteration as K). The K slices carry identical values —
    # that is fine; hoisting is blocked by tracing, not by value diversity.
    K = 8
    x0, rest = args[0], args[1:]
    xs = jnp.broadcast_to(x0[None], (K,) + x0.shape)

    def stream(xs_, *a):
        def body(c, x):
            out = fn(x, *a)
            return c + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = lax.scan(body, jnp.float32(0), xs_)
        return acc

    sfn = jax.jit(stream)
    vals = [bench_marginal(sfn, [(xs,) + tuple(rest)] * 4, n_small=5,
                           n_large=20)["iter_ms"] / K for _ in range(3)]
    return float(np.median(vals))


def main():
    rng = np.random.default_rng(0)
    rows = []
    for tag, B, H, W, C in SHAPES:
        x = jnp.asarray(rng.uniform(-1, 1, (B, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.1, (N_LAYERS, 3, 3, C, C)),
                        jnp.bfloat16)
        b = jnp.asarray(rng.normal(0, 0.1, (N_LAYERS, C)), jnp.bfloat16)
        sw = jnp.asarray(np.abs(np.asarray(w, np.float32)).max(
            axis=(1, 2, 3)) / 127.0)  # (n, C)
        sx = jnp.full((N_LAYERS,), 1.0 / 127.0, jnp.float32)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32)
                                / sw[:, None, None, None, :]),
                      -127, 127).astype(jnp.int8)
        b32 = b.astype(jnp.float32)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 127), -127,
                      127).astype(jnp.int8)

        t_bf16 = bench(functools.partial(chain_bf16, n=N_LAYERS), (x, w, b))
        t_i8f = bench(functools.partial(chain_int8_float_resident,
                                        n=N_LAYERS), (x, wq, b32, sx, sw))
        t_i8c = bench(functools.partial(chain_int8_resident, n=N_LAYERS),
                      (xq, wq, b32, sx, sw))
        flops = 2 * B * H * W * C * C * 9 * N_LAYERS
        row = {"shape": tag, "B": B, "H": H, "W": W, "C": C,
               "layers": N_LAYERS,
               "bf16_ms": round(t_bf16, 4),
               "int8_float_resident_ms": round(t_i8f, 4),
               "int8_resident_ms": round(t_i8c, 4),
               "bf16_tf_s": round(flops / t_bf16 / 1e9, 1),
               "int8_resident_tf_s": round(flops / t_i8c / 1e9, 1),
               "int8_resident_vs_bf16": round(t_bf16 / t_i8c, 3)}
        rows.append(row)
        print(f"# {tag}: bf16 {t_bf16:.4f} ms ({row['bf16_tf_s']} TF/s)  "
              f"int8-float {t_i8f:.4f}  int8-resident {t_i8c:.4f} "
              f"({row['int8_resident_vs_bf16']}x vs bf16)", file=sys.stderr)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
