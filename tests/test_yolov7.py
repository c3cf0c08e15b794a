"""YOLOv7: RepConv/SPPCSPC torch-functional parity + full-graph smoke.

Decode semantics are shared with yolov5 (same yololayer.cu family) and are
parity-tested there; here we pin the v7-specific blocks."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _bn_ref(x, g, b, m, v, eps=1e-3):
    return F.batch_norm(x, torch.from_numpy(m), torch.from_numpy(v),
                        torch.from_numpy(g), torch.from_numpy(b), eps=eps)


def test_repconv_matches_torch(rng):
    from tensorrtx_tpu.models.yolov7 import _rep_a, _repconv_p

    ci, co = 8, 16
    raw = {}
    for name, k in (("model.9.rbr_dense.0", 3), ("model.9.rbr_1x1.0", 1)):
        raw[f"{name}.weight"] = rng.normal(0, 0.1, (co, ci, k, k)).astype(np.float32).ravel()
    for name in ("model.9.rbr_dense.1", "model.9.rbr_1x1.1"):
        raw[f"{name}.weight"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
        raw[f"{name}.bias"] = rng.normal(0, 0.1, co).astype(np.float32)
        raw[f"{name}.running_mean"] = rng.normal(0, 0.1, co).astype(np.float32)
        raw[f"{name}.running_var"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
    wm = WeightMap(raw)
    rp = jax.tree.map(jnp.asarray, _repconv_p(wm, 9, ci, co))
    x = rng.normal(0, 1, (1, ci, 10, 12)).astype(np.float32)
    got = np.asarray(_rep_a(rp, jnp.asarray(x.transpose(0, 2, 3, 1))))

    xt = torch.from_numpy(x)
    wd = torch.from_numpy(raw["model.9.rbr_dense.0.weight"].reshape(co, ci, 3, 3))
    w1 = torch.from_numpy(raw["model.9.rbr_1x1.0.weight"].reshape(co, ci, 1, 1))
    d = _bn_ref(F.conv2d(xt, wd, padding=1),
                raw["model.9.rbr_dense.1.weight"], raw["model.9.rbr_dense.1.bias"],
                raw["model.9.rbr_dense.1.running_mean"], raw["model.9.rbr_dense.1.running_var"])
    o = _bn_ref(F.conv2d(xt, w1),
                raw["model.9.rbr_1x1.1.weight"], raw["model.9.rbr_1x1.1.bias"],
                raw["model.9.rbr_1x1.1.running_mean"], raw["model.9.rbr_1x1.1.running_var"])
    exp = F.silu(d + o)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp.numpy(), atol=2e-5)


def test_yolov7_graph(rng):
    model = get_model("yolov7")
    cfg = dataclasses.replace(model.default_cfg(), input_h=256, input_w=256,
                              conf_thresh=0.01, max_det=32)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out["boxes"].shape == (1, 32, 4)
    cfg2 = dataclasses.replace(cfg, postprocess="raw")
    raw = jax.jit(lambda p, x: model.apply(p, x, cfg2))(params, x)
    n = sum((256 // s) ** 2 * 3 for s in (8, 16, 32))
    assert raw["boxes"].shape == (1, n, 4)
    assert np.isfinite(np.asarray(raw["conf"])).all()
