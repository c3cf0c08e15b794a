"""PP-OCRv5 mobile rec: SVTR block torch parity + full-graph smoke + CTC.

The torch reference re-derives block.cpp:496-543 semantics independently
(8-head attention over dim 120, fused qkv sliced per part, swish MLP)."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _torch_svtr_block(x, p):
    def ln(x, g, b):
        return F.layer_norm(x, (120,), torch.from_numpy(g),
                            torch.from_numpy(b), eps=1e-5)

    def lin(x, w, b):
        return x @ torch.from_numpy(w) + torch.from_numpy(b)

    h = ln(x, p["ln0_g"], p["ln0_b"])
    qkv = lin(h, p["qkv_w"], p["qkv_b"])
    b, t, _ = x.shape
    # reference slices w[:, part*120:(part+1)*120] (block.cpp:956-969)
    q, k, v = [qkv[..., i * 120:(i + 1) * 120].reshape(b, t, 8, 15)
               .permute(0, 2, 1, 3) for i in range(3)]
    attn = torch.softmax((q / np.sqrt(15.0)) @ k.transpose(-1, -2), dim=-1)
    ctx = (attn @ v).permute(0, 2, 1, 3).reshape(b, t, 120)
    x = x + lin(ctx, p["proj_w"], p["proj_b"])
    h = ln(x, p["ln1_g"], p["ln1_b"])
    h = lin(h, p["mlp0_w"], p["mlp0_b"])
    h = h * torch.sigmoid(h)
    return x + lin(h, p["mlp1_w"], p["mlp1_b"])


def test_svtr_block_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_rec import _svtr_block

    tp = {"ln0_g": rng.normal(1, 0.1, 120).astype(np.float32),
          "ln0_b": rng.normal(0, 0.1, 120).astype(np.float32),
          "qkv_w": rng.normal(0, 0.1, (120, 360)).astype(np.float32),
          "qkv_b": rng.normal(0, 0.1, 360).astype(np.float32),
          "proj_w": rng.normal(0, 0.1, (120, 120)).astype(np.float32),
          "proj_b": rng.normal(0, 0.1, 120).astype(np.float32),
          "ln1_g": rng.normal(1, 0.1, 120).astype(np.float32),
          "ln1_b": rng.normal(0, 0.1, 120).astype(np.float32),
          "mlp0_w": rng.normal(0, 0.1, (120, 240)).astype(np.float32),
          "mlp0_b": rng.normal(0, 0.1, 240).astype(np.float32),
          "mlp1_w": rng.normal(0, 0.1, (240, 120)).astype(np.float32),
          "mlp1_b": rng.normal(0, 0.1, 120).astype(np.float32)}
    sp = {"ln0": {"g": jnp.asarray(tp["ln0_g"]), "b": jnp.asarray(tp["ln0_b"])},
          "qkv": {"w": jnp.asarray(tp["qkv_w"]), "b": jnp.asarray(tp["qkv_b"])},
          "proj": {"w": jnp.asarray(tp["proj_w"]),
                   "b": jnp.asarray(tp["proj_b"])},
          "ln1": {"g": jnp.asarray(tp["ln1_g"]), "b": jnp.asarray(tp["ln1_b"])},
          "mlp0": {"w": jnp.asarray(tp["mlp0_w"]),
                   "b": jnp.asarray(tp["mlp0_b"])},
          "mlp1": {"w": jnp.asarray(tp["mlp1_w"]),
                   "b": jnp.asarray(tp["mlp1_b"])}}
    x = rng.normal(0, 1, (2, 17, 120)).astype(np.float32)
    got = np.asarray(_svtr_block(sp, jnp.asarray(x)))
    exp = _torch_svtr_block(torch.from_numpy(x), tp).numpy()
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_ppocr_rec_full_graph(rng):
    model = get_model("ppocrv5_rec")
    cfg = dataclasses.replace(model.default_cfg(), num_classes=97,
                              input_w=160)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, 48, 160, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 160 // 8, 97)
    o = np.asarray(out)
    np.testing.assert_allclose(o.sum(-1), 1.0, atol=1e-4)  # softmax rows
    (text, conf), = model.postprocess(out, cfg)
    assert isinstance(text, str) and 0.0 <= conf <= 1.0


def test_ppocr_rec_width_is_static_bucketed():
    """Dynamic-width profile (config.h:23-26) maps to static buckets."""
    from tensorrtx_tpu.ops.ocr_preprocess import rec_width_bucket

    assert rec_width_bucket(100, 48, 32) == 160
    assert rec_width_bucket(4000, 48, 32) == 3200
