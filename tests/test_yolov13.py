"""YOLOv13: DSConv torch parity + hyperedge-gen semantics + graph smoke."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_dsconv_matches_torch(rng):
    from tensorrtx_tpu.models.yolov13 import _dsconv_a, _dsconv_p

    ci, co, k, d = 8, 12, 5, 2
    raw = {"m.dw.weight": rng.normal(0, .1, (ci, 1, k, k)).astype(np.float32),
           "m.pw.weight": rng.normal(0, .1, (co, ci, 1, 1)).astype(np.float32),
           "m.bn.weight": rng.uniform(.5, 1.5, co).astype(np.float32),
           "m.bn.bias": rng.normal(0, .1, co).astype(np.float32),
           "m.bn.running_mean": rng.normal(0, .1, co).astype(np.float32),
           "m.bn.running_var": rng.uniform(.5, 1.5, co).astype(np.float32)}
    wm = WeightMap({k_: v.ravel() for k_, v in raw.items()})
    pp = jax.tree.map(jnp.asarray, _dsconv_p(wm, "m", ci, co, k))
    x = rng.normal(0, 1, (1, ci, 14, 14)).astype(np.float32)
    got = np.asarray(_dsconv_a(pp, jnp.asarray(x.transpose(0, 2, 3, 1)),
                               dilation=d))
    xt = torch.from_numpy(x)
    y = F.conv2d(xt, torch.from_numpy(raw["m.dw.weight"]),
                 padding=d * (k - 1) // 2, dilation=d, groups=ci)
    y = F.conv2d(y, torch.from_numpy(raw["m.pw.weight"]))
    y = F.batch_norm(y, torch.from_numpy(raw["m.bn.running_mean"]),
                     torch.from_numpy(raw["m.bn.running_var"]),
                     torch.from_numpy(raw["m.bn.weight"]),
                     torch.from_numpy(raw["m.bn.bias"]), eps=1e-3)
    exp = F.silu(y).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp, atol=2e-5)


def test_hyperedge_participation_normalizes_over_nodes(rng):
    """AdaHyperedgeGen softmaxes over NODES (block.cpp:696-697 axes 1<<1):
    each hyperedge's membership sums to 1 across tokens."""
    from tensorrtx_tpu.models.yolov13 import _hyperedge_gen_a, _hyperedge_gen_p

    dim, edges, nh = 32, 4, 2
    wm = RandomWeightMap(seed=1)
    p = jax.tree.map(jnp.asarray, _hyperedge_gen_p(wm, "g", dim, edges))
    x = jnp.asarray(rng.normal(0, 1, (2, 9, dim)).astype(np.float32))
    a = np.asarray(_hyperedge_gen_a(p, x, edges, nh))
    assert a.shape == (2, 9, edges)
    np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-5)


def test_yolov13_graph(rng):
    model = get_model("yolov13")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=256,
                              conf_thresh=0.01, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    cfg2 = dataclasses.replace(cfg, postprocess="raw")
    raw = jax.jit(lambda p, x: model.apply(p, x, cfg2))(params, x)
    n = sum((256 // s) ** 2 for s in (8, 16, 32))
    assert raw["boxes"].shape == (1, n, 4)
    assert np.isfinite(np.asarray(raw["boxes"])).all()
