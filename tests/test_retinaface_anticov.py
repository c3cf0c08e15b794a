"""RetinaFaceAntiCov: decode semantics vs a scalar reference of
decode.cu:110-149 + full-graph smoke."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_anticov_decode_matches_cuda_scalar(rng):
    from tensorrtx_tpu.models.retinaface_anticov import _decode_level

    h = w = 4
    step, anchor = 8, 16
    cls = rng.uniform(0, 1, (1, h, w, 4)).astype(np.float32)
    bbox = rng.normal(0, 0.3, (1, h, w, 8)).astype(np.float32)
    lmk = rng.normal(0, 0.3, (1, h, w, 20)).astype(np.float32)
    typ = rng.uniform(0, 1, (1, h, w, 6)).astype(np.float32)
    bx, cf, mk, lm = [np.asarray(t) for t in _decode_level(
        jnp.asarray(cls), jnp.asarray(bbox), jnp.asarray(lmk),
        jnp.asarray(typ), step, anchor)]

    # scalar re-derivation of the CUDA kernel
    idx = 0
    for y in range(h):
        for x in range(w):
            for k in range(2):
                n = (y * w + x) * 2 + k
                prior = [7.5 + x * step, 7.5 + y * step,
                         anchor * 2 / (k + 1), anchor * 2 / (k + 1)]
                b0 = prior[0] + bbox[0, y, x, 4 * k] * prior[2]
                b1 = prior[1] + bbox[0, y, x, 4 * k + 1] * prior[3]
                b2 = prior[2] * np.exp(bbox[0, y, x, 4 * k + 2])
                b3 = prior[3] * np.exp(bbox[0, y, x, 4 * k + 3])
                x1 = b0 - (b2 - 1) / 2
                y1 = b1 - (b3 - 1) / 2
                np.testing.assert_allclose(
                    bx[0, n], [x1, y1, x1 + b2, y1 + b3], rtol=1e-5)
                assert abs(cf[0, n] - cls[0, y, x, 2 + k]) < 1e-6
                assert abs(mk[0, n] - typ[0, y, x, 2 + k]) < 1e-6
                exp_lm0 = prior[0] + lmk[0, y, x, 10 * k] * 0.2 * prior[2]
                np.testing.assert_allclose(lm[0, n, 0], exp_lm0, rtol=1e-5)
            idx += 1


def test_anticov_graph(rng):
    model = get_model("retinaface-anticov")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=256,
                              conf_thresh=0.3, max_det=16)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 16, 4)
    assert out["landmarks"].shape == (1, 16, 10)
    assert np.isfinite(np.asarray(out["mask_conf"])).all()
    # softmaxed confidences live in [0, 1]
    assert (np.asarray(out["scores"]) <= 1.0).all()
