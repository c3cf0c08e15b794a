"""Batch-phase (bp) serving rewrites: fold f images into the channel dim
with block-diagonal weights (ops/nn.py batch_fold rationale — at b≥16 the
P1-P3 conv stages have C ≤ 64 in the 128 MXU lanes; folding fills them and
cuts output rows f×). All rewrites are numerically exact: the off-diagonal
zeros add exact +0 to every accumulator."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.models import _yolo_blocks as B
from tensorrtx_tpu.ops import nn


@pytest.mark.fast
def test_batch_fold_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (8, 6, 5, 3)), jnp.float32)
    xf = nn.batch_fold(x, 4)
    assert xf.shape == (2, 6, 5, 12)
    np.testing.assert_array_equal(np.asarray(nn.batch_unfold(xf, 4)),
                                  np.asarray(x))
    # channel block i of group g is image g*f+i
    np.testing.assert_array_equal(np.asarray(xf[1, ..., 6:9]),
                                  np.asarray(x[6]))


@pytest.mark.fast
@pytest.mark.parametrize("f,stride", [(2, 1), (4, 1), (2, 2)])
def test_bp_conv_matches_per_image(rng, f, stride):
    x = jnp.asarray(rng.normal(0, 1, (8, 12, 10, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (7,)), jnp.float32)
    ref = nn.conv2d(x, w, b, stride=stride, padding=1)
    got = nn.batch_unfold(
        nn.conv2d(nn.batch_fold(x, f), nn.bp_conv_weights(w, f),
                  nn.bp_bias(b, f), stride=stride, padding=1), f)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.fast
def test_bp_conv_segments(rng):
    """in_segments consumes concats of folded tensors; out_segments emits
    segment-major outputs whose static slices are valid folded tensors."""
    f = 2
    xa = jnp.asarray(rng.normal(0, 1, (4, 8, 6, 3)), jnp.float32)
    xb = jnp.asarray(rng.normal(0, 1, (4, 8, 6, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (1, 1, 5, 6)), jnp.float32)
    ref = nn.conv2d(jnp.concatenate([xa, xb], -1), w, None)
    cat = jnp.concatenate([nn.batch_fold(xa, f), nn.batch_fold(xb, f)], -1)
    got = nn.conv2d(cat, nn.bp_conv_weights(w, f, in_segments=(3, 2),
                                            out_segments=(2, 4)), None)
    seg0, seg1 = got[..., :f * 2], got[..., f * 2:]
    re = jnp.concatenate([nn.batch_unfold(seg0, f),
                          nn.batch_unfold(seg1, f)], -1)
    # segment permutation reorders the K accumulation — 1-ulp noise only
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.fast
def test_bp_c3k2_and_dwconv_match(rng):
    wm = RandomWeightMap(seed=4)
    p = jax.tree.map(jnp.asarray, B.c3k2_p(wm, "s", 32, 64, 2, False, e=0.25))
    dw = jax.tree.map(jnp.asarray, B.conv_p(wm, "dw", 12, 12, 3, groups=12))
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 12, 32)), jnp.float32)
    ref = B.c3k2_a(p, x)
    got = nn.batch_unfold(B.c3k2_a(B.bp_c3k2_p(p, 2), nn.batch_fold(x, 2)), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
    xd = jnp.asarray(rng.normal(0, 1, (4, 8, 8, 12)), jnp.float32)
    refd = B.dwconv_a(dw, xd)
    gotd = nn.batch_unfold(
        B.dwconv_a(B.bp_dwconv_p(dw, 2), nn.batch_fold(xd, 2)), 2)
    np.testing.assert_array_equal(np.asarray(gotd), np.asarray(refd))


def test_yolo11_folded_serving_path(rng):
    """The b≥16 gate in yolo11.apply_s2d routes through _apply_s2d_folded;
    outputs must equal the per-image (gate-off) graph."""
    from tensorrtx_tpu.models import yolo11 as Y

    cfg = dataclasses.replace(Y.Yolo11Cfg(), scale="n", input_h=128,
                              input_w=128, max_det=16)
    params = jax.tree.map(jnp.asarray,
                          Y.build_params(RandomWeightMap(seed=0), cfg))
    x4 = jnp.asarray(rng.normal(0, 0.5, (16, 32, 32, 48)), jnp.float32)
    got = Y.apply_s2d(params, x4, cfg)      # b16 → folded
    for i in (0, 5, 15):
        one = Y.apply_s2d(params, x4[i:i + 1], cfg)   # b1 → plain
        for k in one:
            np.testing.assert_allclose(np.asarray(got[k][i:i + 1]),
                                       np.asarray(one[k]),
                                       rtol=1e-4, atol=1e-4)


def test_c3k2_bp_refold_matches(rng):
    p = jax.tree.map(jnp.asarray, B.c3k2_p(
        RandomWeightMap(seed=9), "m2", 32, 64, 1, False, e=0.25))
    x = jnp.asarray(rng.normal(0, 1, (8, 16, 12, 32)), jnp.float32)
    ref = B.c3k2_a(p, x)
    got = nn.batch_unfold(
        B.c3k2_bp_refold_a(p, nn.batch_fold(x, 2), 2, 4), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
