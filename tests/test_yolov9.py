"""YOLOv9-c: ADown torch parity + full-graph smoke (decode family is
pinned by the yolov8/yolo11 parity tests)."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def test_adown_matches_torch(rng):
    from tensorrtx_tpu.models.yolov9 import _adown_a, _adown_p

    ci, co = 16, 16
    raw = {}
    for name, cin, k in (("model.4.cv1", ci // 2, 3), ("model.4.cv2", ci // 2, 1)):
        raw[f"{name}.conv.weight"] = rng.normal(0, 0.1, (co // 2, cin, k, k)).astype(np.float32)
        raw[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, co // 2).astype(np.float32)
        raw[f"{name}.bn.bias"] = rng.normal(0, 0.1, co // 2).astype(np.float32)
        raw[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, co // 2).astype(np.float32)
        raw[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, co // 2).astype(np.float32)
    wm = WeightMap({k: v.ravel() for k, v in raw.items()})
    ap = jax.tree.map(jnp.asarray, _adown_p(wm, "model.4", ci, co))
    x = rng.normal(0, 1, (1, ci, 12, 12)).astype(np.float32)
    got = np.asarray(_adown_a(ap, jnp.asarray(x.transpose(0, 2, 3, 1))))

    def cbs(x, name, pad, stride):
        y = F.conv2d(x, torch.from_numpy(raw[f"{name}.conv.weight"]),
                     padding=pad, stride=stride)
        y = F.batch_norm(y, torch.from_numpy(raw[f"{name}.bn.running_mean"]),
                         torch.from_numpy(raw[f"{name}.bn.running_var"]),
                         torch.from_numpy(raw[f"{name}.bn.weight"]),
                         torch.from_numpy(raw[f"{name}.bn.bias"]), eps=1e-3)
        return F.silu(y)

    xt = F.avg_pool2d(torch.from_numpy(x), 2, 1, 0)
    x1, x2 = xt[:, :ci // 2], xt[:, ci // 2:]
    y1 = cbs(x1, "model.4.cv1", 1, 2)
    y2 = cbs(F.max_pool2d(x2, 3, 2, 1), "model.4.cv2", 0, 1)
    exp = torch.cat([y1, y2], 1).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp, atol=2e-5)


def test_yolov9_graph(rng):
    model = get_model("yolov9")
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
    # anchor-free ltrb decode keeps boxes in plausible image range
    assert (np.asarray(raw["conf"]) <= 1.0).all()
