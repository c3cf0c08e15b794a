"""Fused Pallas int8 conv kernels (ops/pallas/qconv) vs the XLA chain path.

Contract: qconv{3x3,1x1} compute the SAME producer contract as
qchain.ChainCtx's run-mode convs (int8 dot → dequant+bias+act → requant /
float exit), so outputs must match the XLA formulation within ±1 LSB on
requant rounding boundaries (the int32 accumulator is exact; only the VPU
SiLU transcendental and round-half ties can differ). Reference analog: the
fused INT8 conv+act kernels TRT emits inside an int8 engine
(/root/reference/yolo11/src/model.cpp USE_INT8 path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorrtx_tpu.ops import qchain
from tensorrtx_tpu.ops.pallas import qconv

pytestmark = pytest.mark.fast


def _mk_chain_inputs(rng, H, W, C, Co, k):
    x = rng.standard_normal((2, H, W, C)).astype(np.float32)
    s_in = np.float32(np.abs(x).max() / 127.0)
    xq = jnp.clip(jnp.round(jnp.asarray(x) / s_in), -127, 127).astype(jnp.int8)
    w = (rng.standard_normal((k, k, C, Co)) * 0.05).astype(np.float32)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-8)
    wq = jnp.asarray(
        np.clip(np.round(w / sw[None, None, None]), -127, 127), jnp.int8)
    b = (rng.standard_normal(Co) * 0.1).astype(np.float32)
    return xq, jnp.float32(s_in), wq, sw.astype(np.float32), jnp.asarray(b)


def _xla_ref(xq, s_in, wq, sw, b, s_out, act, res=None, res_s=None,
             out_float=False):
    """The qchain XLA formulation, inlined (same ops ChainCtx.conv emits)."""
    import jax.lax as lax

    k = wq.shape[0]
    p = k // 2
    acc = lax.conv_general_dilated(
        xq, wq, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * (s_in * sw)[None, None, None, :]
    o = o + b.astype(jnp.float32)
    if res is not None:
        o = o + res.astype(jnp.float32) * res_s
    o = qchain._act_f(o, act)
    if out_float:
        return o.astype(jnp.bfloat16)
    return qchain._rq(o, s_out)


@pytest.mark.parametrize("k,H,W,C,Co", [(3, 8, 16, 128, 128),
                                        (1, 4, 16, 256, 64)])
@pytest.mark.parametrize("act", ["silu", "relu", None])
def test_qconv_matches_xla_chain(rng, k, H, W, C, Co, act):
    xq, s_in, wq, sw, b = _mk_chain_inputs(rng, H, W, C, Co, k)
    s_out = jnp.float32(0.07)
    fn = qconv.qconv3x3 if k == 3 else qconv.qconv1x1
    got = fn(xq, wq, s_in * sw, b, s_out, act=act, interpret=True)
    want = _xla_ref(xq, s_in, wq, sw, b, s_out, act)
    d = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert d.max() <= 1, f"max LSB diff {d.max()}"
    assert (d > 0).mean() < 0.01  # ties are rare, not systematic


def test_qconv_residual_and_float_exit(rng):
    H, W, C, Co = 8, 16, 128, 128
    xq, s_in, wq, sw, b = _mk_chain_inputs(rng, H, W, C, Co, 3)
    res = (rng.integers(-127, 128, (2, H, W, Co))).astype(np.int8)
    res_s = jnp.float32(0.03)
    s_out = jnp.float32(0.09)
    got = qconv.qconv3x3(xq, wq, s_in * sw, b, s_out, act="relu",
                         residual=jnp.asarray(res), res_scale=res_s,
                         interpret=True)
    want = _xla_ref(xq, s_in, wq, sw, b, s_out, "relu",
                    res=jnp.asarray(res), res_s=res_s)
    d = np.abs(np.asarray(got, np.int32) - np.asarray(want, np.int32))
    assert d.max() <= 1
    # float exit: compare against the f32 reference rounded to bf16
    gf = qconv.qconv3x3(xq, wq, s_in * sw, b, s_out, act=None,
                        out_float=True, interpret=True)
    wf = _xla_ref(xq, s_in, wq, sw, b, s_out, None, out_float=True)
    np.testing.assert_allclose(np.asarray(gf, np.float32),
                               np.asarray(wf, np.float32),
                               rtol=0.02, atol=0.02)


def test_chainctx_dispatch_equivalence(rng):
    """ChainCtx(pallas='interpret') produces the same int8 payloads as the
    XLA path on a conv → conv_add → conv_out mini-chain at kernel-eligible
    shapes — proving dispatch alignment, not just kernel numerics."""
    H, W, C = 8, 16, 128
    x = rng.standard_normal((2, H, W, C)).astype(np.float32)
    ws = [(rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32),
          (rng.standard_normal((1, 1, C, C)) * 0.05).astype(np.float32),
          (rng.standard_normal((3, 3, C, C)) * 0.05).astype(np.float32)]
    bs = [(rng.standard_normal(w.shape[-1]) * 0.1).astype(np.float32)
          for w in ws]

    def chain(ctx, xin):
        h = ctx.quant_in(xin)
        h = ctx.conv(h, ws[0], bs[0], act="silu")
        h = ctx.conv_add(h, ws[1], bs[1], h, act="relu")
        return ctx.conv_out(h, ws[2], bs[2])

    tap = qchain.ChainCtx("tap", enter="stem")
    chain(tap, jnp.asarray(x))
    scales = jnp.asarray([t / 127.0 for t in tap.taps], jnp.float32)
    wq, sw = qchain.quantize_chain_weights(tap.ws, tap.w_is_dw)

    outs = {}
    for name, flag in [("xla", False), ("pallas", "interpret")]:
        ctx = qchain.ChainCtx("run", scales=scales, wq=wq, sw=sw,
                              enter="stem", pallas=flag)
        outs[name] = np.asarray(chain(ctx, jnp.asarray(x)), np.float32)
    # the interpret run must actually have taken the kernel path
    assert qconv.supports(3, 1, H, W, C, C)
    np.testing.assert_allclose(outs["pallas"], outs["xla"],
                               rtol=0.05, atol=0.05)
