"""Fused letterbox+first-conv serving fast path.

Covers the TPU-first batch-1 optimization (see ops/preprocess.letterbox_s2d):
the letterbox emits a 2x2 space-to-depth parity tensor and the model's 3x3
stride-2 first conv runs as a 2x2 stride-1 conv on it. Semantics must be
IDENTICAL to the reference pipeline (warpaffine preprocess.cu + first layer):
every test checks the fused path against the plain letterbox+conv composition.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorrtx_tpu.ops import nn
from tensorrtx_tpu.ops.nms import topk_hier
from tensorrtx_tpu.ops.preprocess import (letterbox_batch, letterbox_s2d,
                                          letterbox_s2d_batch)


def _s2d(x, f=2):
    """Reference f×f space-to-depth, channel blocks ordered (a, b, c)."""
    planes = [x[a::f, b::f, :] for a in range(f) for b in range(f)]
    return np.concatenate(planes, axis=-1)


@pytest.mark.parametrize("src_hw", [(64, 64), (48, 64), (64, 30), (20, 36)])
def test_letterbox_s2d_matches_letterbox(src_hw):
    rng = np.random.default_rng(0)
    sh, sw = src_hw
    fr = np.zeros((1, 64, 64, 3), np.uint8)
    fr[0, :sh, :sw] = rng.integers(0, 255, (sh, sw, 3), np.uint8)
    hw = jnp.asarray([[sh, sw]], jnp.int32)
    ref = np.asarray(letterbox_batch(jnp.asarray(fr), hw, 64, 64))[0]
    got = np.asarray(letterbox_s2d(jnp.asarray(fr[0]), sh, sw, 64, 64,
                                   out_dtype=jnp.float32))
    np.testing.assert_allclose(got, _s2d(ref), atol=2e-3)


def test_letterbox_s2d_bgr_offset():
    rng = np.random.default_rng(1)
    fr = rng.integers(0, 255, (32, 32, 3), np.uint8)
    ref = np.asarray(letterbox_batch(jnp.asarray(fr[None]),
                                     jnp.asarray([[32, 32]], jnp.int32),
                                     32, 32, bgr_to_rgb=True, offset=-0.5))[0]
    got = np.asarray(letterbox_s2d(jnp.asarray(fr), 32, 32, 32, 32,
                                   bgr_to_rgb=True, offset=-0.5,
                                   out_dtype=jnp.float32))
    np.testing.assert_allclose(got, _s2d(ref), atol=2e-3)


def test_letterbox_s2d_factor4():
    rng = np.random.default_rng(6)
    fr = np.zeros((1, 64, 64, 3), np.uint8)
    fr[0, :48, :64] = rng.integers(0, 255, (48, 64, 3), np.uint8)
    hw = jnp.asarray([[48, 64]], jnp.int32)
    ref = np.asarray(letterbox_batch(jnp.asarray(fr), hw, 64, 64))[0]
    got = np.asarray(letterbox_s2d(jnp.asarray(fr[0]), 48, 64, 64, 64,
                                   out_dtype=jnp.float32, factor=4))
    assert got.shape == (16, 16, 48)
    np.testing.assert_allclose(got, _s2d(ref, 4), atol=2e-3)


def test_conv2d_s2d4_two_level_cascade():
    """letterbox(f=4) → conv2d_s2d4 → conv2d_s2d ≡ letterbox → two strided
    convs (the YOLO stem fast path; see models/yolo11.py apply_s2d)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 32, 32, 3)), jnp.float32)
    w0 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 6)), jnp.float32)
    b0 = jnp.asarray(rng.normal(0, 0.2, (6,)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 6, 10)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.2, (10,)), jnp.float32)
    ref = nn.conv2d(nn.silu(nn.conv2d(x, w0, b0, stride=2, padding=1)),
                    w1, b1, stride=2, padding=1)
    x4 = jnp.asarray(_s2d(np.asarray(x[0]), 4))[None]
    y1 = nn.silu(nn.conv2d_s2d4(x4, nn.s2d4_conv_weights(w0), b0))
    got = nn.conv2d_s2d(y1, nn.s2d_conv_weights(w1), b1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv2d_s2d_matches_strided_conv():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (7,)), jnp.float32)
    ref = nn.conv2d(x, w, b, stride=2, padding=1)
    x2 = jnp.stack([jnp.asarray(_s2d(np.asarray(xi))) for xi in x])
    got = nn.conv2d_s2d(x2, nn.s2d_conv_weights(w), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_topk_hier_exact_with_ties():
    rng = np.random.default_rng(3)
    # heavy ties to exercise the lower-index tie-break guarantee
    x = jnp.asarray(rng.choice(np.linspace(0.0, 1.0, 37), size=(3, 8400)),
                    jnp.float32)
    rv, ri = jax.lax.top_k(x, 300)
    hv, hi = topk_hier(x, 300)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(hv))
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(hi))
    # fallback when the axis doesn't split: still exact
    y = x[:, :8399]
    rv, ri = jax.lax.top_k(y, 300)
    hv, hi = topk_hier(y, 300)
    np.testing.assert_array_equal(np.asarray(ri), np.asarray(hi))


def test_yolo11_apply_s2d_matches_apply():
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("yolo11")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=32)
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    rng = np.random.default_rng(4)
    fr = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    hw = jnp.asarray([[64, 48]], jnp.int32)

    x = letterbox_batch(fr, hw, 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    x2 = letterbox_s2d_batch(fr, hw, 64, 64, out_dtype=jnp.float32,
                             factor=model.apply_s2d.factor)
    got = model.apply_s2d(params, x2, cfg)
    assert int(ref["count"][0]) == int(got["count"][0])
    n = int(ref["count"][0])
    np.testing.assert_allclose(np.asarray(got["boxes"][0][:n]),
                               np.asarray(ref["boxes"][0][:n]),
                               rtol=1e-3, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(got["classes"][0][:n]),
                                  np.asarray(ref["classes"][0][:n]))


def test_serving_pipeline_uses_s2d_and_matches():
    import jax

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.core.runner import ServingPipeline

    model = get_model("yolo11")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=32)
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    eng = Engine("yolo11", params, cfg, "fp32")
    pipe = ServingPipeline(eng, src_h=64, src_w=64, donate=False)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (56, 64, 3), np.uint8)
    out = pipe.detect_images([img])
    # the standard (non-s2d) path on the same engine must agree
    from tensorrtx_tpu.ops.preprocess import letterbox_batch as lb

    frames = np.zeros((1, 64, 64, 3), np.uint8)
    frames[0, :56, :64] = img
    x = lb(jnp.asarray(frames), jnp.asarray([[56, 64]], jnp.int32), 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    assert len(out[0]["scores"]) == int(ref["count"][0])


def test_yolov8_apply_s2d_matches_apply():
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("yolov8")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=32)
    params = model.build_params(RandomWeightMap(seed=1), cfg)
    rng = np.random.default_rng(8)
    fr = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    hw = jnp.asarray([[64, 40]], jnp.int32)

    x = letterbox_batch(fr, hw, 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    x4 = letterbox_s2d_batch(fr, hw, 64, 64, out_dtype=jnp.float32,
                             factor=model.apply_s2d.factor)
    got = model.apply_s2d(params, x4, cfg)
    assert int(ref["count"][0]) == int(got["count"][0])
    n = int(ref["count"][0])
    np.testing.assert_allclose(np.asarray(got["boxes"][0][:n]),
                               np.asarray(ref["boxes"][0][:n]),
                               rtol=1e-3, atol=5e-2)


@pytest.mark.parametrize("name", ["yolov9", "yolov9:t", "yolov10", "yolov12",
                                  "yolo26", "yolov7", "yolov4",
                                  "scaled-yolov4", "yolov3", "yolov5-lite",
                                  "yolov13"])
def test_detector_apply_s2d_matches_apply(name):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    name, _, scale = name.partition(":")
    model = get_model(name)
    cfg = model.default_cfg()
    over = dict(input_h=64, input_w=64, max_det=16)
    if scale:  # yolov9 converted-graph scales have their own s2d stem path
        over["scale"] = scale
    elif hasattr(cfg, "scale") and name != "yolov9":
        over["scale"] = "n"
    cfg = dataclasses.replace(cfg, **over)
    params = model.build_params(RandomWeightMap(seed=2), cfg)
    rng = np.random.default_rng(9)
    fr = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    hw = jnp.asarray([[64, 52]], jnp.int32)

    x = letterbox_batch(fr, hw, 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    x4 = letterbox_s2d_batch(fr, hw, 64, 64, out_dtype=jnp.float32,
                             factor=model.apply_s2d.factor)
    got = model.apply_s2d(params, x4, cfg)
    assert int(ref["count"][0]) == int(got["count"][0])
    n = int(ref["count"][0])
    np.testing.assert_allclose(np.asarray(got["boxes"][0][:n]),
                               np.asarray(ref["boxes"][0][:n]),
                               rtol=1e-3, atol=5e-2)


def test_yolov5_apply_s2d_matches_apply():
    """The 6x6 p2 stem exercises the generalized k/p s2d rewrite."""
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("yolov5")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=16)
    params = model.build_params(RandomWeightMap(seed=3), cfg)
    rng = np.random.default_rng(10)
    fr = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    hw = jnp.asarray([[64, 44]], jnp.int32)

    x = letterbox_batch(fr, hw, 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    x4 = letterbox_s2d_batch(fr, hw, 64, 64, out_dtype=jnp.float32,
                             factor=model.apply_s2d.factor)
    got = model.apply_s2d(params, x4, cfg)
    assert int(ref["count"][0]) == int(got["count"][0])
    n = int(ref["count"][0])
    np.testing.assert_allclose(np.asarray(got["boxes"][0][:n]),
                               np.asarray(ref["boxes"][0][:n]),
                               rtol=1e-3, atol=5e-2)


@pytest.mark.parametrize("k,p", [(3, 1), (5, 2)])
def test_conv2d_s2d_s1_matches_plain_conv(k, p):
    """Stride-1 s2d rewrite: s2d(conv(x)) == conv2d_s2d_s1(s2d(x))."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (k, k, 3, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.2, (8,)).astype(np.float32))
    ref = np.asarray(nn.conv2d(x, w, b, stride=1, padding=p))
    x2 = jnp.asarray(np.stack([_s2d(np.asarray(xi)) for xi in x]))
    got = np.asarray(nn.conv2d_s2d_s1(x2, nn.s2d_s1_conv_weights(w, p), b))
    ref_s2d = np.stack([_s2d(r) for r in ref])
    assert got.shape == ref_s2d.shape
    np.testing.assert_allclose(got, ref_s2d, atol=1e-4)


def test_conv2d_s2d_s1_chains_into_conv2d_s2d():
    """Full-res s1 stem then s2 conv, all in s2d space (yolov7 pattern)."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 3)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8)).astype(np.float32))
    b0 = jnp.asarray(rng.normal(0, 0.2, (8,)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.2, (3, 3, 8, 16)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(0, 0.2, (16,)).astype(np.float32))
    ref = nn.conv2d(nn.silu(nn.conv2d(x, w0, b0, stride=1, padding=1)),
                    w1, b1, stride=2, padding=1)
    x2 = jnp.asarray(np.stack([_s2d(np.asarray(xi)) for xi in x]))
    y0 = nn.silu(nn.conv2d_s2d_s1(x2, nn.s2d_s1_conv_weights(w0), b0))
    got = nn.conv2d_s2d(y0, nn.s2d_conv_weights(w1), b1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_yolop_apply_s2d_matches_apply():
    """YOLOP's Focus layer IS a 2×2 s2d: the fast path must reproduce the
    det output and both segmentation maps exactly."""
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("yolop")
    cfg = dataclasses.replace(model.default_cfg(), input_h=64, input_w=64,
                              max_det=16)
    params = model.build_params(RandomWeightMap(seed=4), cfg)
    rng = np.random.default_rng(13)
    fr = jnp.asarray(rng.integers(0, 255, (1, 64, 64, 3), np.uint8))
    hw = jnp.asarray([[64, 48]], jnp.int32)

    x = letterbox_batch(fr, hw, 64, 64)
    ref = model.apply(params, x.astype(jnp.float32), cfg)
    x2 = letterbox_s2d_batch(fr, hw, 64, 64, out_dtype=jnp.float32,
                             factor=model.apply_s2d.factor)
    got = model.apply_s2d(params, x2, cfg)
    assert set(ref.keys()) == set(got.keys())
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-3, atol=5e-2, err_msg=k)


def test_space_to_depth2_roundtrip():
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 12, 5)).astype(np.float32))
    x2 = nn.space_to_depth2(x)
    assert x2.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(x2[0]), _s2d(np.asarray(x[0])))
    np.testing.assert_array_equal(np.asarray(nn.depth_to_space2(x2)),
                                  np.asarray(x))
