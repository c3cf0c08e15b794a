"""YOLOv12: area-attention torch parity + full-graph smoke."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _mk_cbn(rng, raw, name, co, ci, k, groups=1, bias=False):
    raw[f"{name}.conv.weight"] = rng.normal(0, 0.1, (co, ci // groups, k, k)).astype(np.float32)
    if bias:
        raw[f"{name}.conv.bias"] = rng.normal(0, 0.1, co).astype(np.float32)
    raw[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, co).astype(np.float32)
    raw[f"{name}.bn.bias"] = rng.normal(0, 0.1, co).astype(np.float32)
    raw[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, co).astype(np.float32)
    raw[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, co).astype(np.float32)


def _t_cbn(x, raw, name, pad=0, groups=1):
    b = raw.get(f"{name}.conv.bias")
    y = F.conv2d(x, torch.from_numpy(raw[f"{name}.conv.weight"]),
                 torch.from_numpy(b) if b is not None else None,
                 padding=pad, groups=groups)
    return F.batch_norm(y, torch.from_numpy(raw[f"{name}.bn.running_mean"]),
                        torch.from_numpy(raw[f"{name}.bn.running_var"]),
                        torch.from_numpy(raw[f"{name}.bn.weight"]),
                        torch.from_numpy(raw[f"{name}.bn.bias"]), eps=1e-3)


def test_area_attention_matches_torch(rng):
    """Independent re-derivation of AAttn (yolov12/src/block.cpp:520):
    area-chunked attention, head_dim 32, scale 0.176777, dw7x7 pe on v."""
    from tensorrtx_tpu.models.yolov12 import _aattn_a, _aattn_p

    dim, area, h, w = 64, 2, 4, 8       # 2 heads of 32
    raw = {}
    _mk_cbn(rng, raw, "a.qkv", dim * 3, dim, 1)
    _mk_cbn(rng, raw, "a.pe", dim, dim, 7, groups=dim, bias=True)
    _mk_cbn(rng, raw, "a.proj", dim, dim, 1)
    wm = WeightMap({k: v.ravel() for k, v in raw.items()})
    ap = jax.tree.map(jnp.asarray, _aattn_p(wm, "a", dim))
    x = rng.normal(0, 1, (1, dim, h, w)).astype(np.float32)
    got = np.asarray(_aattn_a(ap, jnp.asarray(x.transpose(0, 2, 3, 1)), area))

    xt = torch.from_numpy(x)
    qkv = _t_cbn(xt, raw, "a.qkv")                       # (1, 3dim, h, w)
    n = h * w // area
    nh = dim // 32
    q_ = qkv.flatten(2).transpose(1, 2)                  # (1, N, 3dim)
    q_ = q_.reshape(area, n, nh, 3, 32)
    q, k, v = q_[..., 0, :], q_[..., 1, :], q_[..., 2, :]
    q, k, v = [t.permute(0, 2, 1, 3) for t in (q, k, v)]  # (area, nh, n, 32)
    attn = torch.softmax(q @ k.transpose(-1, -2) * 0.176777, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(1, h, w, dim).permute(0, 3, 1, 2)
    v_sp = v.permute(0, 2, 1, 3).reshape(1, h, w, dim).permute(0, 3, 1, 2)
    pe = _t_cbn(v_sp, raw, "a.pe", pad=3, groups=dim)
    exp = _t_cbn(out + pe, raw, "a.proj").numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), exp, atol=3e-5)


def test_yolov12_graph(rng):
    model = get_model("yolov12")
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
