"""UVDoc: grid-sample torch parity + block parity + graph smoke."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.ops.grid_sample import grid_sample_bilinear


def test_grid_sample_matches_torch(rng):
    x = rng.normal(0, 1, (2, 7, 9, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)
    got = np.asarray(grid_sample_bilinear(jnp.asarray(x), jnp.asarray(grid)))
    with torch.no_grad():
        exp = F.grid_sample(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                            torch.from_numpy(grid), mode="bilinear",
                            padding_mode="zeros", align_corners=True).numpy()
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)), atol=1e-5)


def test_uvdoc_residual_block_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_uvdoc import _res

    ch, d = 8, 3
    raw = {}
    for name in ("conv2d_20", "conv2d_21"):
        raw[f"{name}.w_0"] = rng.normal(0, 0.08, (ch, ch, 5, 5)).astype(
            np.float32).ravel()
        raw[f"{name}.b_0"] = rng.normal(0, 0.05, ch).astype(np.float32)
    for name in ("batch_norm2d_20", "batch_norm2d_21"):
        raw[f"{name}.w_0"] = rng.uniform(0.8, 1.2, ch).astype(np.float32)
        raw[f"{name}.b_0"] = rng.normal(0, 0.05, ch).astype(np.float32)
        raw[f"{name}.w_1"] = rng.normal(0, 0.05, ch).astype(np.float32)
        raw[f"{name}.w_2"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    from tensorrtx_tpu.core.params import WeightMap
    from tensorrtx_tpu.models.ppocr_uvdoc import _res_block

    bp = jax.tree.map(jnp.asarray, _res_block(WeightMap(raw), ch, 20, 20,
                                              21, 21))
    x = rng.normal(0, 1, (1, ch, 13, 13)).astype(np.float32)
    got = np.asarray(_res(bp, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), d))

    def tcbn(v, cname, bname):
        w = torch.from_numpy(raw[f"{cname}.w_0"].reshape(ch, ch, 5, 5))
        b = torch.from_numpy(raw[f"{cname}.b_0"])
        y = F.conv2d(v, w, b, padding=d * 2, dilation=d)
        g, bb, m, var = (torch.from_numpy(raw[f"{bname}.{s}"])
                         for s in ("w_0", "b_0", "w_1", "w_2"))
        return F.batch_norm(y, m, var, g, bb, eps=1e-5)

    with torch.no_grad():
        t = torch.from_numpy(x)
        y = F.relu(tcbn(t, "conv2d_20", "batch_norm2d_20"))
        y = tcbn(y, "conv2d_21", "batch_norm2d_21")
        exp = F.relu(y + t).numpy()
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)), atol=2e-4)


def test_uvdoc_full_graph(rng):
    model = get_model("uvdoc")
    cfg = dataclasses.replace(model.default_cfg(), input_h=128, input_w=128,
                              resize_h=96, resize_w=64)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()
