"""Row-phase (s2dh) op family: numerics vs the plain NHWC formulations.

These ops back the UNet full-res level and the yolo P3-stage fast path
(ops/nn.py space_to_depth_h / conv2d_s2dh / conv2d_s2dh_exit /
maxpool2_s2dh / upsample_bilinear_to_s2dh; _yolo_blocks.c3k2_down_a).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorrtx_tpu.ops import nn


@pytest.mark.fast
def test_space_to_depth_h_roundtrip(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 6, 5)), jnp.float32)
    xh = nn.space_to_depth_h(x)
    assert xh.shape == (2, 4, 6, 10)
    np.testing.assert_array_equal(np.asarray(nn.depth_to_space_h(xh)),
                                  np.asarray(x))
    # channel order (α, c): block row y channel α·C+c == full row 2y+α
    np.testing.assert_array_equal(np.asarray(xh[0, 1, :, 5:]),
                                  np.asarray(x[0, 3]))


@pytest.mark.fast
@pytest.mark.parametrize("k", [1, 3, 5])
def test_conv2d_s2dh_matches_conv2d(rng, k):
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 10, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (k, k, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (7,)), jnp.float32)
    ref = nn.conv2d(x, w, b, padding=k // 2)
    got = nn.depth_to_space_h(nn.conv2d_s2dh(
        nn.space_to_depth_h(x), nn.s2dh_s1_conv_weights(w, k // 2), b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.fast
def test_conv2d_s2dh_exit_matches_stride2(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 10, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 5, 7)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (7,)), jnp.float32)
    ref = nn.conv2d(x, w, b, stride=2, padding=1)
    got = nn.conv2d_s2dh_exit(nn.space_to_depth_h(x),
                              nn.s2dh_exit_conv_weights(w), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.fast
def test_conv2d_s2dh_segments(rng):
    """in_segments consumes whole-tensor concats; out_segments emits split
    halves at segment boundaries — both exactly equal to the α-major form."""
    xa = jnp.asarray(rng.normal(0, 1, (2, 12, 10, 3)), jnp.float32)
    xb = jnp.asarray(rng.normal(0, 1, (2, 12, 10, 2)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 5, 6)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (6,)), jnp.float32)
    ref = nn.space_to_depth_h(
        nn.conv2d(jnp.concatenate([xa, xb], -1), w, b, padding=1))
    cat = jnp.concatenate([nn.space_to_depth_h(xa),
                           nn.space_to_depth_h(xb)], -1)
    got = nn.conv2d_s2dh(
        cat, nn.s2dh_s1_conv_weights(w, in_segments=(3, 2),
                                     out_segments=(2, 4)),
        b, out_segments=(2, 4))
    bs = got.shape[:3]
    seg0 = got[..., :4].reshape(*bs, 2, 2)
    seg1 = got[..., 4:].reshape(*bs, 2, 4)
    re = jnp.concatenate([seg0[..., 0, :], seg1[..., 0, :],
                          seg0[..., 1, :], seg1[..., 1, :]], -1)
    np.testing.assert_allclose(np.asarray(re), np.asarray(ref), atol=2e-5)


@pytest.mark.fast
def test_maxpool2_s2dh(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 6, 5)), jnp.float32)
    ref = nn.max_pool(x, 2, 2)
    got = nn.maxpool2_s2dh(nn.space_to_depth_h(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.fast
@pytest.mark.parametrize("ac", [False, True])
def test_upsample_bilinear_to_s2dh(rng, ac):
    x = jnp.asarray(rng.normal(0, 1, (2, 6, 5, 4)), jnp.float32)
    ref = nn.upsample_bilinear(x, (12, 10), align_corners=ac)
    got = nn.depth_to_space_h(
        nn.upsample_bilinear_to_s2dh(x, (12, 10), align_corners=ac))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.fast
def test_c3k2_down_a_matches_plain(rng):
    """The shared P3-stage motif: row-phase == plain within dot-order noise."""
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.models import _yolo_blocks as B

    wm = RandomWeightMap(seed=3)
    p4 = B.c3k2_p(wm, "m4", 32, 64, 2, False, e=0.25)
    p5 = B.conv_p(wm, "m5", 64, 64, 3)
    p4 = jax.tree.map(jnp.asarray, p4)
    p5 = jax.tree.map(jnp.asarray, p5)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 12, 32)), jnp.float32)
    c4p = B.c3k2_a(p4, x)
    dp = B.conv_a(p5, c4p, stride=2)
    c4, d = B.c3k2_down_a(p4, p5, x)
    np.testing.assert_allclose(np.asarray(c4), np.asarray(c4p),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dp),
                               rtol=2e-5, atol=2e-4)
    # batch >8 must take the plain path bit-exactly
    xb = jnp.tile(x, (9, 1, 1, 1))
    c4b, db = B.c3k2_down_a(p4, p5, xb)
    np.testing.assert_array_equal(np.asarray(c4b[0]),
                                  np.asarray(B.c3k2_a(p4, xb)[0]))


@pytest.mark.fast
def test_c3_down_a_matches_plain(rng):
    """YOLOv5-family C3+downsample motif: both gate branches vs the planar
    composition (ADVICE r3 — the batch>8 planar branch was untested)."""
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.models import _yolo_blocks as B

    wm = RandomWeightMap(seed=5)
    p_c3 = B.c3_p(wm, "m2", 32, 64, 2)
    p_dn = B.conv_p(wm, "m3", 64, 64, 3)
    p_c3 = jax.tree.map(jnp.asarray, p_c3)
    p_dn = jax.tree.map(jnp.asarray, p_dn)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 12, 32)), jnp.float32)
    ref_c = B.c3_a(p_c3, x)
    ref_d = B.conv_a(p_dn, ref_c, stride=2)
    c, d = B.c3_down_a(p_c3, p_dn, x)            # row-phase branch (b=1)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d),
                               rtol=2e-5, atol=2e-4)
    xb = jnp.tile(x, (9, 1, 1, 1))               # planar branch (b=9)
    cb, db = B.c3_down_a(p_c3, p_dn, xb)
    np.testing.assert_array_equal(np.asarray(cb[0]),
                                  np.asarray(B.c3_a(p_c3, xb)[0]))
    np.testing.assert_array_equal(
        np.asarray(db[0]),
        np.asarray(B.conv_a(p_dn, B.c3_a(p_c3, xb), stride=2)[0]))


@pytest.mark.fast
def test_yolov7_elan_mp_s2dh_matches_plain(rng):
    """yolov7 backbone ELAN + transition + MP in row-phase space vs the
    planar composition, both gate branches (ADVICE r3)."""
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.models import yolov7 as Y
    from tensorrtx_tpu.models import _yolo_blocks as B

    wm = RandomWeightMap(seed=7)
    ep = jax.tree.map(jnp.asarray, Y._elan_p(wm, 4, 24, 16, 16))
    f11p = jax.tree.map(jnp.asarray, Y._cv(wm, 11, 64, 32, 1))
    mpp = jax.tree.map(jnp.asarray, Y._mp_p(wm, 12, 32, 16))

    def planar(x):
        y = B.conv_a(f11p, Y._elan_a(ep, x, False))
        return Y._mp_a(mpp, y)

    x = jnp.asarray(rng.normal(0, 1, (1, 16, 12, 24)), jnp.float32)
    got = Y._elan_mp_s2dh_a(ep, f11p, mpp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(planar(x)),
                               rtol=2e-5, atol=2e-4)


def test_dense_grouped_weights(rng):
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 12)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8)), jnp.float32)  # g=4
    ref = nn.conv2d(x, w, None, padding=1, groups=4)
    wd = nn.dense_grouped_weights(w, 4)
    got = nn.conv2d(x, wd, None, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
