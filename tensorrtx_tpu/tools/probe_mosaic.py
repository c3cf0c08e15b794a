"""Probe Mosaic/Pallas primitive support on the attached TPU (scratch tool).

Questions the fused int8 conv kernel design depends on:
  1. int8 x int8 -> int32 dot inside a Pallas kernel (MXU int8 rate)
  2. unaligned static sublane slices of f32 VMEM scratch (offset +-1)
  3. pltpu.roll by 1 on the sublane axis (f32)
  4. unaligned static sublane slices of int8 (offset not multiple of 32)
  5. 3D block -> 2D shape-cast when minor-2 dim is a multiple of the tile
Run each in its own subprocess-free try block; print PASS/FAIL + error head.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
rng = np.random.default_rng(0)


def run(name, fn):
    try:
        ok, msg = fn()
        print(f"{'PASS' if ok else 'FAIL'} {name}: {msg}")
    except Exception as e:
        print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")


def probe_int8_dot():
    A = rng.integers(-127, 127, (256, 256), dtype=np.int8)
    B = rng.integers(-127, 127, (256, 128), dtype=np.int8)

    def k(a, b, o):
        o[:] = jax.lax.dot_general(
            a[:], b[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(A), jnp.asarray(B))
    ref = A.astype(np.int32) @ B.astype(np.int32)
    ok = np.array_equal(np.asarray(out), ref)
    return ok, "exact int32 match" if ok else "MISMATCH"


def probe_unaligned_f32_slice():
    X = rng.uniform(-1, 1, (264, 128)).astype(np.float32)

    def k(x, o):
        o[:] = x[1:257, :] + x[3:259, :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(X))
    ref = X[1:257] + X[3:259]
    ok = np.allclose(np.asarray(out), ref)
    return ok, "ok" if ok else "MISMATCH"


def probe_roll_sublane_f32():
    X = rng.uniform(-1, 1, (256, 128)).astype(np.float32)

    def k(x, o):
        o[:] = pltpu.roll(x[:], 1, 0)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(X))
    ref = np.roll(X, 1, 0)
    ok = np.allclose(np.asarray(out), ref)
    return ok, "ok" if ok else "MISMATCH"


def probe_unaligned_int8_slice():
    X = rng.integers(-127, 127, (288, 128), dtype=np.int8)

    def k(x, o):
        o[:] = x[1:257, :]

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(X))
    ref = X[1:257]
    ok = np.array_equal(np.asarray(out), ref)
    return ok, "ok" if ok else "MISMATCH"


def probe_3d_to_2d_cast():
    X = rng.uniform(-1, 1, (4, 80, 128)).astype(np.float32)

    def k(x, o):
        o[:] = x[:].reshape(320, 128) * 2.0

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((320, 128), f32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(X))
    ok = np.allclose(np.asarray(out), X.reshape(320, 128) * 2)
    return ok, "ok" if ok else "MISMATCH"


def probe_int8_cast_dot():
    # f32 assembly -> int8 cast -> int8 dot, all in one kernel
    A = rng.integers(-127, 127, (256, 256)).astype(np.float32)
    B = rng.integers(-127, 127, (256, 128), dtype=np.int8)

    def k(a, b, o, a8):
        a8[:] = a[:].astype(jnp.int8)
        o[:] = jax.lax.dot_general(
            a8[:], b[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((256, 256), jnp.int8)],
    )(jnp.asarray(A), jnp.asarray(B))
    ref = A.astype(np.int32) @ np.asarray(B, np.int32)
    ok = np.array_equal(np.asarray(out), ref)
    return ok, "ok" if ok else "MISMATCH"


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("int8_dot", probe_int8_dot)
    run("unaligned_f32_slice", probe_unaligned_f32_slice)
    run("roll_sublane_f32", probe_roll_sublane_f32)
    run("unaligned_int8_slice", probe_unaligned_int8_slice)
    run("3d_to_2d_cast", probe_3d_to_2d_cast)
    run("int8_cast_dot", probe_int8_cast_dot)
