"""RoIAlign vs torchvision-exact scalar reference; DCNv2 vs torch unfold
reference."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tensorrtx_tpu.ops.dcn import dcn_v2
from tensorrtx_tpu.ops.roi_align import roi_align


def ref_roi_align(feat, roi, scale, ph, pw, sr):
    """Scalar port of RoiAlign.cu:83-175 semantics (aligned=False)."""
    H, W, C = feat.shape
    x1, y1, x2, y2 = roi * scale
    rw = max(x2 - x1, 1.0)
    rh = max(y2 - y1, 1.0)
    bh, bw = rh / ph, rw / pw
    out = np.zeros((ph, pw, C), np.float32)
    for py in range(ph):
        for px in range(pw):
            acc = np.zeros(C, np.float32)
            for iy in range(sr):
                for ix in range(sr):
                    y = y1 + (py + (iy + 0.5) / sr) * bh
                    x = x1 + (px + (ix + 0.5) / sr) * bw
                    if y <= -1 or y >= H or x <= -1 or x >= W:
                        continue
                    y = min(max(y, 0), H - 1)
                    x = min(max(x, 0), W - 1)
                    y0, x0 = int(y), int(x)
                    y1i, x1i = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                    ly, lx = y - y0, x - x0
                    acc += (feat[y0, x0] * (1 - ly) * (1 - lx)
                            + feat[y0, x1i] * (1 - ly) * lx
                            + feat[y1i, x0] * ly * (1 - lx)
                            + feat[y1i, x1i] * ly * lx)
            out[py, px] = acc / (sr * sr)
    return out


def test_roi_align_matches_reference(rng):
    feat = rng.normal(0, 1, (16, 20, 8)).astype(np.float32)
    rois = np.array([[4.0, 8.0, 60.0, 44.0],
                     [0.0, 0.0, 80.0, 64.0],
                     [30.0, 20.0, 34.0, 25.0]], np.float32)
    got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25,
                               (7, 7), 2))
    for i, roi in enumerate(rois):
        exp = ref_roi_align(feat, roi, 0.25, 7, 7, 2)
        np.testing.assert_allclose(got[i], exp, atol=1e-4)


def test_roi_align_matmul_matches_gather(rng):
    """The MXU (separable-matmul) path is the same math as the gather path —
    identical samples and border rule, f32 accumulation order aside."""
    from tensorrtx_tpu.ops.roi_align import roi_align_matmul

    feat = rng.normal(0, 1, (16, 20, 8)).astype(np.float32)
    rois = np.array([[4.0, 8.0, 60.0, 44.0],
                     [0.0, 0.0, 80.0, 64.0],
                     [30.0, 20.0, 34.0, 25.0],
                     [-12.0, -9.0, 6.0, 2.0],      # partially outside
                     [70.0, 55.0, 95.0, 80.0]],    # clipped at far border
                    np.float32)
    ref = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25,
                               (7, 5), 2))
    got = np.asarray(roi_align_matmul(jnp.asarray(feat), jnp.asarray(rois),
                                      0.25, (7, 5), 2))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # aligned=True variant too
    ref = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), 0.25,
                               (7, 7), 2, aligned=True))
    got = np.asarray(roi_align_matmul(jnp.asarray(feat), jnp.asarray(rois),
                                      0.25, (7, 7), 2, aligned=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dcn_v2_zero_offset_equals_conv(rng):
    """With zero offsets and unit masks, DCNv2 must equal a plain conv."""
    x = rng.normal(0, 1, (1, 10, 12, 4)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 4, 6)).astype(np.float32)
    b = rng.normal(0, 0.1, 6).astype(np.float32)
    offset = np.zeros((1, 10, 12, 18), np.float32)
    mask = np.ones((1, 10, 12, 9), np.float32)
    got = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset),
                            jnp.asarray(mask), jnp.asarray(w), jnp.asarray(b)))
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w.transpose(3, 2, 0, 1)),
                   torch.from_numpy(b), padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dcn_v2_integer_offset_shifts(rng):
    """Integer offsets sample shifted pixels exactly (interior check)."""
    x = rng.normal(0, 1, (1, 12, 12, 2)).astype(np.float32)
    # weight selecting only the center tap (k=4) of a 3x3 kernel
    w = np.zeros((3, 3, 2, 2), np.float32)
    w[1, 1] = np.eye(2)
    offset = np.zeros((1, 12, 12, 18), np.float32)
    offset[..., 8] = 2.0   # tap 4 Δy = +2
    offset[..., 9] = -1.0  # tap 4 Δx = -1
    mask = np.ones((1, 12, 12, 9), np.float32)
    got = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset),
                            jnp.asarray(mask), jnp.asarray(w)))
    # interior: out[y, x] = x[y+2, x-1]
    np.testing.assert_allclose(got[0, 3:8, 3:8], x[0, 5:10, 2:7], atol=1e-5)


def test_dcn_v2_mask_modulation(rng):
    x = rng.normal(0, 1, (1, 8, 8, 3)).astype(np.float32)
    w = rng.normal(0, 0.3, (3, 3, 3, 4)).astype(np.float32)
    offset = np.zeros((1, 8, 8, 18), np.float32)
    m_half = np.full((1, 8, 8, 9), 0.5, np.float32)
    m_one = np.ones((1, 8, 8, 9), np.float32)
    a = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(m_half), jnp.asarray(w)))
    b = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset),
                          jnp.asarray(m_one), jnp.asarray(w)))
    np.testing.assert_allclose(a, b * 0.5, atol=1e-5)
