"""Native DB postprocess (native/db_postprocess.cc) vs the numpy oracle.

The reference implements this stage in C++ with OpenCV minAreaRect + the
embedded Clipper library (ppocrv5/src/postprocess.cpp:10-160); here the
native and numpy implementations must agree box-for-box.
"""

import numpy as np
import pytest

from tensorrtx_tpu.ops.db import db_boxes_from_prob

pytestmark = pytest.mark.fast


def _blobby_prob(rng, h=160, w=224, nblobs=6):
    prob = np.zeros((h, w), np.float32)
    for _ in range(nblobs):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        ry, rx = rng.uniform(3, 14), rng.uniform(3, 24)
        th = rng.uniform(0, np.pi)
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        dy, dx = ys - cy, xs - cx
        u = dx * np.cos(th) + dy * np.sin(th)
        v = -dx * np.sin(th) + dy * np.cos(th)
        d = (u / rx) ** 2 + (v / ry) ** 2
        prob = np.maximum(prob, np.exp(-d).astype(np.float32))
    return prob


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    prob = _blobby_prob(rng)
    ref = db_boxes_from_prob(prob, box_thresh=0.5, native=False)
    got = db_boxes_from_prob(prob, box_thresh=0.5, native=True)
    assert len(ref) == len(got) > 0
    for (rb, rs), (gb, gs) in zip(ref, got):
        np.testing.assert_allclose(gb, rb, atol=1e-3)
        assert abs(gs - rs) < 1e-5


def test_native_thresholds_and_limits():
    rng = np.random.default_rng(7)
    prob = _blobby_prob(rng, nblobs=10)
    for kw in ({"box_thresh": 0.9}, {"min_size": 12},
               {"max_candidates": 2}, {"unclip_ratio": 2.5}):
        ref = db_boxes_from_prob(prob, native=False, **kw)
        got = db_boxes_from_prob(prob, native=True, **kw)
        assert len(ref) == len(got), kw
        for (rb, rs), (gb, gs) in zip(ref, got):
            np.testing.assert_allclose(gb, rb, atol=1e-3, err_msg=str(kw))


def test_degenerate_components():
    # single pixels / thin lines exercise the 1- and 2-point hull paths
    prob = np.zeros((32, 32), np.float32)
    prob[4, 4] = 1.0                    # single pixel (under min_size)
    prob[10, 5:9] = 1.0                 # 1-px-high line
    prob[20:27, 15:18] = 1.0            # small rect
    ref = db_boxes_from_prob(prob, box_thresh=0.5, min_size=2, native=False)
    got = db_boxes_from_prob(prob, box_thresh=0.5, min_size=2, native=True)
    assert len(ref) == len(got)
    for (rb, _), (gb, _) in zip(ref, got):
        np.testing.assert_allclose(gb, rb, atol=1e-3)
