"""RetinaFace decode parity vs a scalar reference of decode.cu:110-175, plus
an end-to-end smoke build."""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorrtx_tpu.models.retinaface import decode_level, VARIANCE


def ref_decode(bbox, cls, lmk, anchors, input_h, input_w):
    b, c8, h, w = bbox.shape
    out = []
    for bi in range(b):
        rows = []
        for yy in range(h):
            for xx in range(w):
                for k in range(2):
                    c1 = cls[bi, k * 2 + 0, yy, xx]
                    c2 = cls[bi, k * 2 + 1, yy, xx]
                    conf = np.exp(c2) / (np.exp(c1) + np.exp(c2))
                    prior = [(xx + 0.5) / w, (yy + 0.5) / h,
                             anchors[k] / input_w, anchors[k] / input_h]
                    bx = bbox[bi, k * 4:k * 4 + 4, yy, xx]
                    cx = prior[0] + bx[0] * 0.1 * prior[2]
                    cy = prior[1] + bx[1] * 0.1 * prior[3]
                    bw = prior[2] * np.exp(bx[2] * 0.2)
                    bh = prior[3] * np.exp(bx[3] * 0.2)
                    x1 = (cx - bw / 2) * input_w
                    y1 = (cy - bh / 2) * input_h
                    lms = []
                    for i in range(0, 10, 2):
                        lx = prior[0] + lmk[bi, k * 10 + i, yy, xx] * 0.1 * prior[2]
                        ly = prior[1] + lmk[bi, k * 10 + i + 1, yy, xx] * 0.1 * prior[3]
                        lms += [lx * input_w, ly * input_h]
                    rows.append(([x1, y1, x1 + bw * input_w, y1 + bh * input_h],
                                 conf, lms))
        out.append(rows)
    return out


def test_decode_level_matches_cuda_reference(rng):
    h, w = 4, 6
    bbox = rng.normal(0, 1, (1, 8, h, w)).astype(np.float32)
    cls = rng.normal(0, 1, (1, 4, h, w)).astype(np.float32)
    lmk = rng.normal(0, 1, (1, 20, h, w)).astype(np.float32)
    boxes, conf, lms = decode_level(
        jnp.asarray(np.transpose(bbox, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(cls, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(lmk, (0, 2, 3, 1))),
        stride=8, anchors=(16, 32), input_h=32, input_w=48)
    exp = ref_decode(bbox, cls, lmk, (16, 32), 32, 48)[0]
    for n, (ebox, econf, elms) in enumerate(exp):
        np.testing.assert_allclose(np.asarray(boxes[0, n]), ebox, atol=1e-3)
        np.testing.assert_allclose(float(conf[0, n]), econf, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lms[0, n]), elms, atol=1e-3)


def test_retinaface_builds_and_runs(rng):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    import jax

    model = get_model("retinaface")
    import dataclasses

    cfg = dataclasses.replace(model.default_cfg(), input_h=128, input_w=160,
                              conf_thresh=0.1, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(-1, 1, (1, 128, 160, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    assert out["extras"].shape == (1, 32, 10)  # landmarks carried through NMS
