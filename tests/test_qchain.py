"""Int8-resident chain tier (ops/qchain + models yolo11.apply_chain).

The chained tier's contract: same graph structure as the bf16 folded
serving path (tap mode IS that float path), int8-resident run mode within
quantization error of it. Reference analog: the int8 engine's accuracy
contract — same detections, not bit-equal logits
(tutorials/check_fp16_int8_support.md; SURVEY.md §7 hard parts).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.engine import Engine
from tensorrtx_tpu.core.quant import ChainedInt8Engine
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.ops import qchain

pytestmark = pytest.mark.fast


def _engine(cfg_over):
    model = get_model("yolo11")
    cfg = dataclasses.replace(model.default_cfg(), **cfg_over)
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    return Engine("yolo11", params, cfg, "bf16")


def test_qchain_primitives_exact_on_monotone_ops(rng):
    """maxpool / upsample / split run on the int8 payload — exact."""
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    s = np.float32(np.abs(x).max() / 127.0)
    q = qchain.QTensor(
        jnp.clip(jnp.round(jnp.asarray(x) / s), -127, 127).astype(jnp.int8),
        jnp.float32(s))
    ctx = qchain.ChainCtx("run", scales=jnp.zeros((0,)), wq=[], sw=[])
    from tensorrtx_tpu.ops import nn

    xq_f = np.asarray(q.q, np.float32) * float(s)
    got = ctx.maxpool(q, 5)
    want = nn.max_pool(jnp.asarray(xq_f), 5, 1, 2)
    np.testing.assert_array_equal(
        np.asarray(got.q, np.float32) * float(s), np.asarray(want))
    up = ctx.upsample(q)
    np.testing.assert_array_equal(
        np.asarray(up.q), np.asarray(nn.upsample_nearest(q.q)))
    a, b = ctx.split(q, (8, 8))
    np.testing.assert_array_equal(np.asarray(a.q), np.asarray(q.q[..., :8]))
    np.testing.assert_array_equal(np.asarray(b.q), np.asarray(q.q[..., 8:]))


def test_qchain_concat_requant_and_add(rng):
    xs = []
    vals = []
    for i in range(2):
        v = rng.standard_normal((1, 4, 4, 8)).astype(np.float32) * (i + 1)
        s = np.float32(np.abs(v).max() / 127.0)
        xs.append(qchain.QTensor(
            jnp.clip(jnp.round(jnp.asarray(v) / s), -127, 127
                     ).astype(jnp.int8), jnp.float32(s)))
        vals.append(v)
    s_cat = np.float32(max(np.abs(v).max() for v in vals) / 127.0)
    ref_add = vals[0] + vals[1]
    s_add = np.float32(np.abs(ref_add).max() / 127.0)  # what calibration taps
    ctx = qchain.ChainCtx("run", scales=jnp.asarray([s_cat, s_add]),
                          wq=[], sw=[])
    cat = ctx.concat(xs)
    ref = np.concatenate(vals, axis=-1)
    got = np.asarray(cat.q, np.float32) * np.asarray(cat.s)
    assert np.abs(got - ref).max() <= 1.5 * s_cat  # 1 requant step of error
    added = ctx.add(xs[0], xs[1])
    got_add = np.asarray(added.q, np.float32) * np.asarray(added.s)
    assert np.abs(got_add - ref_add).max() <= 1.5 * s_add + 2 * s_cat


@pytest.fixture(scope="module")
def chained_pair():
    eng = _engine({"input_h": 192, "input_w": 192, "postprocess": "raw",
                   "conf_thresh": 0.3})
    ce = ChainedInt8Engine(eng)
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (2, 192, 192, 3)).astype(np.uint8)
    ce.calibrate([frames])
    return eng, ce, frames


def test_chained_slot_alignment(chained_pair):
    eng, ce, _ = chained_pair
    assert ce.act_scales is not None
    assert len(ce.act_scales) == ce.n_scales
    assert len(ce.wq) == len(ce.sw)
    n_int8 = sum(1 for w in ce.wq if w.dtype == jnp.int8)
    assert n_int8 > 50  # the backbone/neck/head convs are all chained


def test_chained_matches_float_within_quant_error(chained_pair):
    """Run-mode raw outputs track the tap-mode (float) outputs."""
    eng, ce, frames = chained_pair
    out_q = ce(frames)

    # float reference: the same chain body in tap mode IS the float path
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    x4 = letterbox_s2d_batch(jnp.asarray(frames), hw, 192, 192,
                             out_dtype=jnp.bfloat16, factor=4)
    ctx = qchain.ChainCtx("tap")
    out_f = eng.model.apply_chain(eng.params, x4, eng.cfg, ctx)

    conf_q = np.asarray(out_q["conf"], np.float32).ravel()
    conf_f = np.asarray(out_f["conf"], np.float32).ravel()
    assert np.all(np.isfinite(conf_q))
    # int8 accuracy contract: strong correlation, small mean deviation
    cc = np.corrcoef(conf_q, conf_f)[0, 1]
    assert cc > 0.95, cc
    assert np.abs(conf_q - conf_f).mean() < 0.05

    box_q = np.asarray(out_q["boxes"], np.float32)
    box_f = np.asarray(out_f["boxes"], np.float32)
    # compare where the float path is confident (the detections that matter)
    m = conf_f.reshape(box_f.shape[:2]) > 0.6
    if m.any():
        assert np.abs(box_q[m] - box_f[m]).mean() < 6.0  # px at 192²


@pytest.fixture(scope="module", params=["yolov8", "yolov5", "yolo11"])
def family_chained(request):
    """ChainedInt8Engine across the generalized family (VERDICT r4 #2:
    apply_chain on ≥4 models; the reference ships int8 calibrators for
    yolov5/yolov8/yolo11 alike — yolov5/src/calibrator.cpp et al.)."""
    model = get_model(request.param)
    cfg = dataclasses.replace(model.default_cfg(), input_h=192,
                              input_w=192, postprocess="raw")
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    eng = Engine(request.param, params, cfg, "bf16")
    ce = ChainedInt8Engine(eng)
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (2, 192, 192, 3)).astype(np.uint8)
    ce.calibrate([frames])
    return eng, ce, frames


def test_family_chain_slot_alignment(family_chained):
    eng, ce, _ = family_chained
    assert ce.act_scales is not None
    assert len(ce.act_scales) == ce.n_scales
    assert sum(1 for w in ce.wq if w.dtype == jnp.int8) > 40


def test_family_chain_tap_is_float_path(family_chained):
    """Tap mode must match the model's float s2d serving path (same graph,
    modulo the batch fold — exact block-diagonal numerics)."""
    eng, ce, frames = family_chained
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x4 = letterbox_s2d_batch(fr, hw, 192, 192,
                                 out_dtype=jnp.bfloat16, factor=4)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x4, eng.cfg, ctx), x4

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    out_tap, x4 = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    out_ref = jax.jit(
        lambda p, x: eng.model.apply_s2d(p, x, eng.cfg))(eng.params, x4)
    np.testing.assert_allclose(
        np.asarray(out_tap["conf"], np.float32),
        np.asarray(out_ref["conf"], np.float32), atol=2.5e-2)


def test_family_chain_run_tracks_float(family_chained):
    """Run-mode int8 outputs track the float outputs (the int8 engine
    accuracy contract: same detections, not bit-equal logits)."""
    eng, ce, frames = family_chained
    out_q = ce(frames)
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x4 = letterbox_s2d_batch(fr, hw, 192, 192,
                                 out_dtype=jnp.bfloat16, factor=4)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x4, eng.cfg, ctx)

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    out_f = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    conf_q = np.asarray(out_q["conf"], np.float32).ravel()
    conf_f = np.asarray(out_f["conf"], np.float32).ravel()
    assert np.all(np.isfinite(conf_q))
    cc = np.corrcoef(conf_q, conf_f)[0, 1]
    assert cc > 0.95, cc
    assert np.abs(conf_q - conf_f).mean() < 0.05


@pytest.fixture(scope="module")
def detr_chained():
    """DETR chained tier: int8-resident ResNet backbone + float
    transformer island (the reference's int8 DETR structure,
    detr/README.md:86)."""
    model = get_model("detr")
    cfg = dataclasses.replace(model.default_cfg(), input_h=192,
                              input_w=192, input_format="s2d2")
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    eng = Engine("detr", params, cfg, "bf16")
    ce = ChainedInt8Engine(eng)
    rng = np.random.default_rng(11)
    frames = rng.integers(0, 255, (2, 192, 192, 3)).astype(np.uint8)
    ce.calibrate([frames])
    return eng, ce, frames


def test_detr_chain_fold_clamped(detr_chained):
    _, ce, _ = detr_chained
    assert ce.fold == 1  # apply_chain.folds == (1,): no batch fold
    assert sum(1 for w in ce.wq if w.dtype == jnp.int8) > 30


def test_detr_chain_tap_is_float_path(detr_chained):
    """Tap mode must match the plain DETR float apply on the same s2d2
    tensor (the backbone chain mirror IS backbone_apply(stem_s2d=True))."""
    eng, ce, frames = detr_chained
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x2 = letterbox_s2d_batch(fr, hw, 192, 192,
                                 out_dtype=jnp.bfloat16, factor=2)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x2, eng.cfg, ctx), x2

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    out_tap, x2 = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    out_ref = jax.jit(
        lambda p, x: eng.model.apply(p, x, eng.cfg))(eng.params, x2)
    np.testing.assert_allclose(
        np.asarray(out_tap["scores"], np.float32),
        np.asarray(out_ref["scores"], np.float32), atol=2.5e-2)


def test_detr_chain_run_tracks_float(detr_chained):
    eng, ce, frames = detr_chained
    out_q = ce(frames)
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x2 = letterbox_s2d_batch(fr, hw, 192, 192,
                                 out_dtype=jnp.bfloat16, factor=2)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x2, eng.cfg, ctx)

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    out_f = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    s_q = np.asarray(out_q["scores"], np.float32).ravel()
    s_f = np.asarray(out_f["scores"], np.float32).ravel()
    assert np.all(np.isfinite(s_q))
    cc = np.corrcoef(s_q, s_f)[0, 1]
    assert cc > 0.9, cc
    assert np.abs(s_q - s_f).mean() < 0.05


def test_chained_tap_equals_folded_float_path(chained_pair):
    """Tap mode must BE the bf16 folded serving graph (same numerics)."""
    eng, ce, frames = chained_pair
    from tensorrtx_tpu.models import yolo11 as Y
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    hw = jnp.tile(jnp.asarray([[192, 192]], jnp.int32), (2, 1))
    x4 = letterbox_s2d_batch(jnp.asarray(frames), hw, 192, 192,
                             out_dtype=jnp.bfloat16, factor=4)
    ctx = qchain.ChainCtx("tap")
    out_tap = eng.model.apply_chain(eng.params, x4, eng.cfg, ctx)
    out_fold = Y._apply_s2d_folded(eng.params, x4, eng.cfg, f=2, f2=2)
    np.testing.assert_allclose(
        np.asarray(out_tap["conf"], np.float32),
        np.asarray(out_fold["conf"], np.float32), atol=2e-2)


@pytest.fixture(scope="module")
def yolov9_chained():
    """yolov9-c chained tier: the reference's canonical int8 model —
    yolov9/README.md:42 is the table where int8 beats fp16 at every
    scale (calibrator: yolov9/src/calibrator.cpp). GELAN/ADown/SPPELAN/
    CBFuse chain mirrors in models/_yolo_qchain.py."""
    model = get_model("yolov9")
    cfg = dataclasses.replace(model.default_cfg(), input_h=128,
                              input_w=128, postprocess="raw")
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    eng = Engine("yolov9", params, cfg, "bf16")
    ce = ChainedInt8Engine(eng)
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 255, (2, 128, 128, 3)).astype(np.uint8)
    ce.calibrate([frames])
    return eng, ce, frames


def test_yolov9_chain_slot_alignment(yolov9_chained):
    _, ce, _ = yolov9_chained
    assert ce.fold == 1  # folds == (1,): C >= 256 in the chained region
    assert ce.act_scales is not None
    assert len(ce.act_scales) == ce.n_scales
    assert sum(1 for w in ce.wq if w.dtype == jnp.int8) > 80


def test_yolov9_chain_tap_is_float_path(yolov9_chained):
    """Tap mode must match the float apply_s2d graph on the same parity
    tensor (the chain mirror IS the serving graph in float)."""
    eng, ce, frames = yolov9_chained
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x4 = letterbox_s2d_batch(fr, hw, 128, 128,
                                 out_dtype=jnp.bfloat16, factor=4)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x4, eng.cfg, ctx), x4

    hw = jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (2, 1))
    out_tap, x4 = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    out_ref = jax.jit(
        lambda p, x: eng.model.apply_s2d(p, x, eng.cfg))(eng.params, x4)
    np.testing.assert_allclose(
        np.asarray(out_tap["conf"], np.float32),
        np.asarray(out_ref["conf"], np.float32), atol=2.5e-2)


def test_yolov9_chain_run_tracks_float(yolov9_chained):
    eng, ce, frames = yolov9_chained
    out_q = ce(frames)
    from tensorrtx_tpu.ops.preprocess import letterbox_s2d_batch

    def tap(params, fr, hw):
        x4 = letterbox_s2d_batch(fr, hw, 128, 128,
                                 out_dtype=jnp.bfloat16, factor=4)
        ctx = qchain.ChainCtx("tap")
        return eng.model.apply_chain(params, x4, eng.cfg, ctx)

    hw = jnp.tile(jnp.asarray([[128, 128]], jnp.int32), (2, 1))
    out_f = jax.jit(tap)(eng.params, jnp.asarray(frames), hw)
    conf_q = np.asarray(out_q["conf"], np.float32).ravel()
    conf_f = np.asarray(out_f["conf"], np.float32).ravel()
    assert np.all(np.isfinite(conf_q))
    cc = np.corrcoef(conf_q, conf_f)[0, 1]
    assert cc > 0.95, cc
    assert np.abs(conf_q - conf_f).mean() < 0.05


def test_yolov9_e_chain_builds_and_runs():
    """Scale-e live subgraph chain (SPPELAN + PAN upsample concats) builds,
    calibrates, and serves finite outputs at a tiny size."""
    model = get_model("yolov9")
    cfg = dataclasses.replace(model.default_cfg(), scale="e", input_h=64,
                              input_w=64, postprocess="raw")
    params = model.build_params(RandomWeightMap(), cfg)
    params = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else jnp.asarray(a), params)
    eng = Engine("yolov9", params, cfg, "bf16")
    ce = ChainedInt8Engine(eng)
    rng = np.random.default_rng(17)
    frames = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    ce.calibrate([frames])
    assert len(ce.act_scales) == ce.n_scales
    out = ce(frames)
    assert all(np.all(np.isfinite(np.asarray(v, np.float32)))
               for v in jax.tree.leaves(out))


def test_qchain_avgpool2_and_add_n(rng):
    """avgpool2_s1 runs on the payload at the same scale (<=0.5 LSB);
    add_n requants an N-way sum to one calibrated slot (CBFuse)."""
    vals, xs = [], []
    for i in range(3):
        v = rng.standard_normal((1, 6, 6, 8)).astype(np.float32) * (i + 1)
        s = np.float32(np.abs(v).max() / 127.0)
        xs.append(qchain.QTensor(
            jnp.clip(jnp.round(jnp.asarray(v) / s), -127, 127
                     ).astype(jnp.int8), jnp.float32(s)))
        vals.append(np.asarray(np.asarray(xs[-1].q), np.float32) * s)
    ref_sum = vals[0] + vals[1] + vals[2]
    s_sum = np.float32(np.abs(ref_sum).max() / 127.0)
    ctx = qchain.ChainCtx("run", scales=jnp.asarray([s_sum]), wq=[], sw=[])
    got = ctx.add_n(xs)
    out = np.asarray(got.q, np.float32) * np.asarray(got.s)
    assert np.abs(out - ref_sum).max() <= 1.5 * s_sum
    from tensorrtx_tpu.ops import nn

    ap = ctx.avgpool2_s1(xs[0])
    want = nn.avg_pool(jnp.asarray(vals[0]), 2, 1)
    err = np.abs(np.asarray(ap.q, np.float32) * float(xs[0].s)
                 - np.asarray(want))
    assert err.max() <= 0.51 * float(xs[0].s)
