"""Letterbox preprocessing vs a scalar per-pixel reference implementing the
CUDA warp-affine semantics (yolo11/src/preprocess.cu:7-117)."""

import numpy as np
import jax.numpy as jnp

from tensorrtx_tpu.ops.preprocess import letterbox, scale_boxes_back


def ref_letterbox(img, dst_h, dst_w, border=128.0):
    sh, sw = img.shape[:2]
    s = min(dst_h / sh, dst_w / sw)
    out = np.zeros((dst_h, dst_w, 3), np.float32)
    for dy in range(dst_h):
        for dx in range(dst_w):
            src_x = (dx - dst_w * 0.5) / s + sw * 0.5 + 0.5
            src_y = (dy - dst_h * 0.5) / s + sh * 0.5 + 0.5
            if src_x <= -1 or src_x >= sw or src_y <= -1 or src_y >= sh:
                out[dy, dx] = border
                continue
            x0, y0 = int(np.floor(src_x)), int(np.floor(src_y))
            lx, ly = src_x - x0, src_y - y0
            acc = np.zeros(3)
            for (yy, xx, w) in [(y0, x0, (1 - lx) * (1 - ly)),
                                (y0, x0 + 1, lx * (1 - ly)),
                                (y0 + 1, x0, (1 - lx) * ly),
                                (y0 + 1, x0 + 1, lx * ly)]:
                if 0 <= yy < sh and 0 <= xx < sw:
                    acc += w * img[yy, xx]
                else:
                    acc += w * border
            out[dy, dx] = acc
    return out / 255.0


def test_letterbox_matches_reference_kernel(rng):
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    exp = ref_letterbox(img.astype(np.float32), 32, 32)
    got = np.asarray(letterbox(jnp.asarray(img), 48, 64, 32, 32))
    np.testing.assert_allclose(got, exp, atol=1e-4)


def test_letterbox_padded_bucket(rng):
    """Image in the top-left of a larger static buffer gives identical output."""
    img = rng.integers(0, 256, (40, 52, 3)).astype(np.uint8)
    pad = np.zeros((64, 96, 3), np.uint8)
    pad[:40, :52] = img
    a = np.asarray(letterbox(jnp.asarray(img), 40, 52, 32, 32))
    b = np.asarray(letterbox(jnp.asarray(pad), 40, 52, 32, 32))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_scale_boxes_back_roundtrip():
    # A box at the image corners must map back to original corners.
    sh, sw, dh, dw = 480, 640, 640, 640
    s = min(dh / sh, dw / sw)
    pad_y = (dh - s * sh) / 2
    boxes = jnp.asarray([[0.0 + 0, pad_y, s * sw, dh - pad_y]])
    back = np.asarray(scale_boxes_back(boxes, sh, sw, dh, dw))[0]
    np.testing.assert_allclose(back, [0, 0, sw, sh], atol=1e-3)
