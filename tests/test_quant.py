"""INT8 calibration + quantized engine tests (reference feature:
Int8EntropyCalibrator2, yolo11/src/calibrator.cpp)."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.quant import (QuantizedEngine, calibrate,
                                      entropy_scale, load_scale_cache,
                                      percentile_scale, save_scale_cache)
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.resnet_torch import make
from torch_refs.yolo11_torch import randomize


@pytest.fixture(scope="module")
def r18(tmp_path_factory):
    tm = randomize(make("resnet18", num_classes=10), seed=7).eval()
    wts = tmp_path_factory.mktemp("q") / "r18.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    return build_engine("resnet", str(wts), variant="resnet18", num_classes=10,
                        input_h=64, input_w=64)


def test_entropy_scale_sane():
    # gaussian-ish histogram: threshold should be well below the absmax tail
    rng = np.random.default_rng(0)
    data = np.abs(rng.normal(0, 1.0, 100000))
    data = np.append(data, [8.0])  # one outlier
    hist, _ = np.histogram(data, bins=2048, range=(0, 8.0))
    s_ent = entropy_scale(hist, 8.0)
    s_abs = 8.0 / 127.0
    assert s_ent < s_abs  # entropy clips the outlier tail
    s_pct = percentile_scale(hist, 8.0)
    assert s_pct < s_abs


@pytest.mark.parametrize("method", ["absmax", "entropy"])
def test_int8_resnet18_accuracy(r18, method, rng):
    batches = [rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
               for _ in range(3)]
    scales = calibrate(r18, batches, method=method)
    assert (scales > 0).all()
    qeng = QuantizedEngine(r18, scales)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(r18(x)).astype(np.float32)
    got = np.asarray(qeng(x)).astype(np.float32)
    # INT8 target is accuracy parity, not logit parity (SURVEY.md §7):
    # top-1 must agree and correlation must be high
    assert (got.argmax(1) == ref.argmax(1)).all()
    cc = np.corrcoef(got.reshape(-1), ref.reshape(-1))[0, 1]
    # entropy deliberately clips tails (lower logit fidelity, same decisions)
    assert cc > (0.95 if method == "entropy" else 0.99), cc


def test_scale_cache_roundtrip(tmp_path, r18, rng):
    batches = [rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)]
    scales = calibrate(r18, batches, method="absmax")
    p = tmp_path / "int8calib.table"
    save_scale_cache(str(p), scales, {"model": "resnet18"})
    loaded = load_scale_cache(str(p))
    np.testing.assert_allclose(loaded, scales, rtol=1e-6)


def test_int8_engine_save_load_roundtrip(tmp_path, r18, rng):
    """Productized INT8 (VERDICT weak #6): pre-quantized weights, engine
    dir save/load via load_engine, detections match the live engine."""
    from tensorrtx_tpu.core.engine import load_engine
    from tensorrtx_tpu.core.quant import QuantizedEngine, calibrate

    eng = r18
    x = rng.normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    scales = calibrate(eng, [x], method="absmax")
    q = QuantizedEngine(eng, scales)
    out_live = np.asarray(q(x))
    # weights must be pre-quantized int8 tensors, not recomputed per call
    assert q.wq and all(np.asarray(w).dtype == np.int8 for w in q.wq)

    path = str(tmp_path / "r18_int8")
    q.save(path)
    q2 = load_engine(path)
    assert type(q2).__name__ == "QuantizedEngine"
    out_loaded = np.asarray(q2(x))
    np.testing.assert_allclose(out_loaded, out_live, atol=1e-4)

    # int8 vs fp32 agreement: top-1 class stable, logits close
    out_fp = np.asarray(eng(x))
    assert out_loaded[0].argmax() == out_fp[0].argmax()
    rel = np.abs(out_loaded - out_fp).max() / (np.abs(out_fp).max() + 1e-9)
    assert rel < 0.15


def test_int8_serving_s2d_matches_standard(rng):
    """Int8 engines now ride the s2d serving fast path (raw_apply_s2d):
    the rearranged stem convs must reproduce the standard int8 path
    exactly — the s2d tensor is a pixel permutation, so quantization
    scales transfer and the integer arithmetic is identical."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.core.runner import ServingPipeline
    from tensorrtx_tpu.ops.preprocess import letterbox_batch

    model = get_model("yolo11")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=16)
    params = model.build_params(RandomWeightMap(seed=5), cfg)
    eng = Engine("yolo11", params, cfg, "fp32")
    calib = [rng.integers(0, 255, (1, 64, 64, 3)).astype(np.float32) / 255.0]
    scales = calibrate(eng, calib, method="absmax")
    q = QuantizedEngine(eng, scales)

    frames = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8))
    hw = jnp.asarray([[64, 40]], np.int32)

    pipe = ServingPipeline(q, src_h=64, src_w=64, donate=False)
    got = jax.tree.map(np.asarray, pipe._jitted(pipe._params, frames, hw))

    x = letterbox_batch(frames, hw, 64, 64).astype(jnp.float32)
    ref = jax.tree.map(np.asarray, q.raw_apply(q.params, x))

    assert int(got["count"][0]) == int(ref["count"][0])
    n = int(ref["count"][0])
    np.testing.assert_allclose(got["boxes"][0][:n], ref["boxes"][0][:n],
                               rtol=1e-4, atol=1e-3)


def test_int8_s2d_stem_in_plain_apply_aligned(rng):
    """Models whose PLAIN apply runs an s2d stem (DETR backbone_apply
    stem_s2d=True, rcnn/retinaface analogs) must keep quant indices
    aligned: s2d_conv_weights reports the original kernel to the weight
    spy (regression: the stem consumed a scale index but contributed no
    weight entry, shifting every downstream conv's scales by one)."""
    import dataclasses

    import jax.numpy as jnp

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("detr")
    cfg = dataclasses.replace(model.default_cfg(), input_h=64, input_w=64,
                              input_format="s2d2", num_queries=8,
                              enc_layers=1, dec_layers=1)
    params = model.build_params(RandomWeightMap(seed=3), cfg)
    eng = Engine("detr", params, cfg, "fp32")
    calib = [rng.uniform(0, 1, (1, 32, 32, 12)).astype(np.float32)]
    q = QuantizedEngine(eng, calibrate(eng, calib, method="absmax"))
    out = q(calib[0])  # raises on scale misalignment
    assert np.isfinite(np.asarray(out["scores"])).all()
