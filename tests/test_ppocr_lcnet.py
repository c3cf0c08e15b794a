"""PP-LCNet x1.0 classifier: full-graph torch parity.

Torch reference independently re-derives ppLcNetBlock semantics
(ppocrv5/src/block.cpp:461-477) from the builder call sequence in
ppocrv5/src/model.cpp:109-231.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models.ppocr_lcnet import _BLOCKS, LcnetCfg


def _make_weights(rng):
    raw = {}

    def conv(name, co, ci, k, bias=False):
        raw[f"{name}.w_0"] = rng.normal(0, 0.08, (co, ci, k, k)).astype(
            np.float32).ravel()
        if bias:
            raw[f"{name}.b_0"] = rng.normal(0, 0.05, co).astype(np.float32)

    def bn(name, ch):
        raw[f"{name}.w_0"] = rng.uniform(0.8, 1.2, ch).astype(np.float32)
        raw[f"{name}.b_0"] = rng.normal(0, 0.05, ch).astype(np.float32)
        raw[f"{name}.w_1"] = rng.normal(0, 0.05, ch).astype(np.float32)
        raw[f"{name}.w_2"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)

    conv("conv2d_0", 16, 3, 3)
    bn("batch_norm2d_0", 16)
    for (ci, co, dw, dwbn, pw, pwbn, k, down, se) in _BLOCKS:
        raw[f"conv2d_{dw}.w_0"] = rng.normal(0, 0.08, (ci, 1, k, k)).astype(
            np.float32).ravel()
        bn(f"batch_norm2d_{dwbn}", ci)
        conv(f"conv2d_{pw}", co, ci, 1)
        bn(f"batch_norm2d_{pwbn}", co)
        if se:
            conv(f"conv2d_{dw + 1}", ci // 4, ci, 1, bias=True)
            conv(f"conv2d_{dw + 2}", ci, ci // 4, 1, bias=True)
    conv("conv2d_31", 1280, 512, 1)
    raw["linear_0.w_0"] = rng.normal(0, 0.05, (1280, 2)).astype(
        np.float32).ravel()
    raw["linear_0.b_0"] = rng.normal(0, 0.05, 2).astype(np.float32)
    return raw


def _torch_bn(x, raw, name, eps=1e-5):
    g, b, m, v = (torch.from_numpy(np.asarray(raw[f"{name}.{s}"]))
                  for s in ("w_0", "b_0", "w_1", "w_2"))
    return F.batch_norm(x, m, v, g, b, eps=eps)


def _torch_lcnet(x, raw, down):
    def cw(name, shape):
        return torch.from_numpy(raw[f"{name}.w_0"].reshape(shape))

    y = F.hardswish(_torch_bn(
        F.conv2d(x, cw("conv2d_0", (16, 3, 3, 3)), stride=2, padding=1),
        raw, "batch_norm2d_0"))
    for (ci, co, dw, dwbn, pw, pwbn, k, is_down, se) in _BLOCKS:
        s = down if is_down else (1, 1)
        y = F.hardswish(_torch_bn(
            F.conv2d(y, cw(f"conv2d_{dw}", (ci, 1, k, k)), stride=s,
                     padding=k // 2, groups=ci), raw, f"batch_norm2d_{dwbn}"))
        if se:
            w = y.mean((2, 3), keepdim=True)
            w = F.relu(F.conv2d(w, cw(f"conv2d_{dw+1}", (ci // 4, ci, 1, 1)),
                                torch.from_numpy(raw[f"conv2d_{dw+1}.b_0"])))
            w = F.conv2d(w, cw(f"conv2d_{dw+2}", (ci, ci // 4, 1, 1)),
                         torch.from_numpy(raw[f"conv2d_{dw+2}.b_0"]))
            y = y * torch.clamp(w / 6.0 + 0.5, 0.0, 1.0)
        y = F.hardswish(_torch_bn(
            F.conv2d(y, cw(f"conv2d_{pw}", (co, ci, 1, 1))),
            raw, f"batch_norm2d_{pwbn}"))
    y = y.mean((2, 3), keepdim=True)
    y = F.hardswish(F.conv2d(y, cw("conv2d_31", (1280, 512, 1, 1))))
    y = (y * 0.8).flatten(1)
    logits = y @ torch.from_numpy(raw["linear_0.w_0"].reshape(1280, 2)) + \
        torch.from_numpy(raw["linear_0.b_0"])
    return torch.softmax(logits, dim=-1)


def test_lcnet_textline_matches_torch(rng):
    raw = _make_weights(rng)
    model = get_model("pp_lcnet_x1_0_textline_ori")
    cfg = LcnetCfg(variant="textline_ori")
    params = jax.tree.map(jnp.asarray, model.build_params(WeightMap(raw), cfg))
    x = rng.normal(0, 1, (2, 3, 80, 160)).astype(np.float32)
    got = np.asarray(
        jax.jit(lambda p, v: model.apply(p, v, cfg))(
            params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    with torch.no_grad():
        exp = _torch_lcnet(torch.from_numpy(x), raw, (2, 1)).numpy()
    np.testing.assert_allclose(got, exp, atol=2e-4)
    top = model.postprocess(got, cfg)
    assert top[0][0] == int(exp[0].argmax())
