"""PP-OCRv5 mobile det: graph smoke + torch-functional parity of the
LearnableRep/SE/RSE building blocks (independent re-derivation of
ppocrv5/src/block.cpp semantics)."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_rep_layer_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_det import _rep_a

    ci, co, k = 8, 8, 3
    w = rng.normal(0, 0.1, (co, 1, k, k)).astype(np.float32)   # depthwise
    b = rng.normal(0, 0.1, co).astype(np.float32)
    a0 = rng.normal(1, 0.1, 1).astype(np.float32)
    b0 = rng.normal(0, 0.1, 1).astype(np.float32)
    a1 = rng.normal(1, 0.1, 1).astype(np.float32)
    b1 = rng.normal(0, 0.1, 1).astype(np.float32)
    bp = {"conv": {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)},
          "a0": {"s": jnp.asarray(a0), "b": jnp.asarray(b0)},
          "a1": {"s": jnp.asarray(a1), "b": jnp.asarray(b1)}}
    x = rng.normal(0, 1, (1, ci, 10, 12)).astype(np.float32)
    got = np.asarray(_rep_a(bp, jnp.asarray(x.transpose(0, 2, 3, 1)), k, 1, True))
    t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                 torch.from_numpy(b), padding=1, groups=ci)
    t = t * float(a0) + float(b0)
    t = t * F.hardsigmoid(t)          # paddle hswish = x * relu6(x+3)/6
    t = t * float(a1) + float(b1)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), t.numpy(), atol=1e-5)


def test_rse_layer_semantics(rng):
    from tensorrtx_tpu.models.ppocr_det import _rse

    w = rng.normal(0, 0.1, (24, 96, 3, 3)).astype(np.float32)
    wr = rng.normal(0, 0.1, (6, 24, 1, 1)).astype(np.float32)
    br = rng.normal(0, 0.1, 6).astype(np.float32)
    we = rng.normal(0, 0.1, (24, 6, 1, 1)).astype(np.float32)
    be = rng.normal(0, 0.1, 24).astype(np.float32)
    rp = {"conv": {"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": None},
          "se_r": {"w": jnp.asarray(wr.transpose(2, 3, 1, 0)), "b": jnp.asarray(br)},
          "se_e": {"w": jnp.asarray(we.transpose(2, 3, 1, 0)), "b": jnp.asarray(be)}}
    x = rng.normal(0, 1, (1, 96, 8, 8)).astype(np.float32)
    got = np.asarray(_rse(rp, jnp.asarray(x.transpose(0, 2, 3, 1))))
    t = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1)
    g = t.mean([2, 3], keepdim=True)
    g = F.conv2d(F.relu(F.conv2d(g, torch.from_numpy(wr), torch.from_numpy(br))),
                 torch.from_numpy(we), torch.from_numpy(be))
    gate = torch.clamp(0.2 * g + 0.5, 0, 1)   # hard sigmoid slope 0.2
    exp = t + t * gate
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp.numpy(), atol=1e-5)


def test_ppocr_det_full_graph(rng):
    model = get_model("ppocrv5_det")
    cfg = dataclasses.replace(model.default_cfg(), input_h=160, input_w=192)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 1, (1, 160, 192, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 160, 192, 1)
    o = np.asarray(out)
    assert (o >= 0).all() and (o <= 1).all()
    # DB postprocess runs on the map
    boxes = model.postprocess(out, cfg)[0]
    assert isinstance(boxes, list)
