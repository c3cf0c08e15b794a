"""PP-OCRv5 server det/rec (HGNet): block-level torch parity + graph smoke.

Torch references re-derive block.cpp:545-744 (HG blocks, large-kernel block)
and model.cpp:1553-1563 (same-pad stem) semantics independently.
"""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _bn_weights(raw, rng, name, ch):
    raw[f"{name}.w_0"] = rng.uniform(0.8, 1.2, ch).astype(np.float32)
    raw[f"{name}.b_0"] = rng.normal(0, 0.05, ch).astype(np.float32)
    raw[f"{name}.w_1"] = rng.normal(0, 0.05, ch).astype(np.float32)
    raw[f"{name}.w_2"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)


def _conv_weights(raw, rng, name, co, ci, kh, kw=None, bias=False):
    kw = kh if kw is None else kw
    raw[f"{name}.w_0"] = rng.normal(0, 0.08, (co, ci, kh, kw)).astype(
        np.float32).ravel()
    if bias:
        raw[f"{name}.b_0"] = rng.normal(0, 0.05, co).astype(np.float32)


def _t_bn(x, raw, name, eps=1e-5):
    g, b, m, v = (torch.from_numpy(np.asarray(raw[f"{name}.{s}"]))
                  for s in ("w_0", "b_0", "w_1", "w_2"))
    return F.batch_norm(x, m, v, g, b, eps=eps)


def _t_cbr(x, raw, conv, bn, shape, stride=1, padding=0, groups=1, relu=True):
    w = torch.from_numpy(raw[f"conv2d_{conv}.w_0"].reshape(shape))
    y = _t_bn(F.conv2d(x, w, stride=stride, padding=padding, groups=groups),
              raw, f"batch_norm2d_{bn}")
    return F.relu(y) if relu else y


def test_hg_light_block_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_hgnet import (apply_hg_block,
                                                  build_hg_light_block)

    ci, body_c, body_n = 12, 6, 2
    raw = {}
    for i in range(body_n):
        _conv_weights(raw, rng, f"conv2d_{10 + i*2}", body_c,
                      ci if i == 0 else body_c, 1)
        _bn_weights(raw, rng, f"batch_norm2d_{10 + i*2}", body_c)
        _conv_weights(raw, rng, f"conv2d_{11 + i*2}", body_c, 1, 5)
        _bn_weights(raw, rng, f"batch_norm2d_{11 + i*2}", body_c)
    total = ci + body_n * body_c
    _conv_weights(raw, rng, "conv2d_20", 8, total, 1)
    _bn_weights(raw, rng, "batch_norm2d_20", 8)
    _conv_weights(raw, rng, "conv2d_21", ci, 8, 1)
    _bn_weights(raw, rng, "batch_norm2d_21", ci)

    wm = WeightMap(raw)
    bp = jax.tree.map(jnp.asarray,
                      build_hg_light_block(wm, ci, body_c, body_n, 10, 10,
                                           20, 20, 8, 21, 21, ci, True))
    x = rng.normal(0, 1, (2, ci, 9, 9)).astype(np.float32)
    got = np.asarray(apply_hg_block(
        bp, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), residual=True))

    with torch.no_grad():
        t = torch.from_numpy(x)
        feats = [t]
        y = t
        for i in range(body_n):
            cin = ci if i == 0 else body_c
            y = _t_cbr(y, raw, 10 + i * 2, 10 + i * 2,
                       (body_c, cin, 1, 1), relu=False)
            y = _t_cbr(y, raw, 11 + i * 2, 11 + i * 2, (body_c, 1, 5, 5),
                       padding=2, groups=body_c)
            feats.append(y)
        cat = torch.cat(feats, 1)
        y = _t_cbr(cat, raw, 20, 20, (8, total, 1, 1))
        y = _t_cbr(y, raw, 21, 21, (ci, 8, 1, 1))
        exp = (y + t).numpy()
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)), atol=2e-4)


def test_hg_stem_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_hgnet import apply_hg_stem, build_hg_stem

    raw = {}
    _conv_weights(raw, rng, "conv2d_0", 32, 3, 3)
    _bn_weights(raw, rng, "batch_norm2d_0", 32)
    _conv_weights(raw, rng, "conv2d_1", 16, 32, 2)
    _bn_weights(raw, rng, "batch_norm2d_1", 16)
    _conv_weights(raw, rng, "conv2d_2", 32, 16, 2)
    _bn_weights(raw, rng, "batch_norm2d_2", 32)

    p = jax.tree.map(jnp.asarray, build_hg_stem(WeightMap(raw)))
    x = rng.normal(0, 1, (1, 3, 16, 20)).astype(np.float32)
    got = np.asarray(apply_hg_stem(p, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))

    with torch.no_grad():
        s0 = _t_cbr(torch.from_numpy(x), raw, 0, 0, (32, 3, 3, 3),
                    stride=2, padding=1)
        # addSameConvBnReluTensor: pad bottom/right k-1, then k=2 s=1 conv
        s1 = _t_cbr(F.pad(s0, (0, 1, 0, 1)), raw, 1, 1, (16, 32, 2, 2))
        s2 = _t_cbr(F.pad(s1, (0, 1, 0, 1)), raw, 2, 2, (32, 16, 2, 2))
        pool = F.max_pool2d(F.pad(s0, (0, 1, 0, 1)), 2, stride=1)
        exp = torch.cat([pool, s2], 1).numpy()
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)), atol=2e-4)


def test_large_kernel_block_matches_torch(rng):
    from tensorrtx_tpu.models.ppocr_hgnet import (apply_large_kernel_block,
                                                  build_large_kernel_block)

    raw = {}
    _conv_weights(raw, rng, "conv2d_129", 32, 64, 1, bias=True)
    for n, (kh, kw) in zip((137, 131, 134), [(7, 7), (1, 7), (7, 1)]):
        _conv_weights(raw, rng, f"conv2d_{n}", 32, 32, kh, kw, bias=True)
    for n, (kh, kw) in zip((138, 132, 135), [(5, 5), (1, 5), (5, 1)]):
        _conv_weights(raw, rng, f"conv2d_{n}", 32, 32, kh, kw, bias=True)
    for n, (kh, kw) in zip((139, 133, 136), [(3, 3), (1, 3), (3, 1)]):
        _conv_weights(raw, rng, f"conv2d_{n}", 32, 32, kh, kw, bias=True)
    _conv_weights(raw, rng, "conv2d_130", 64, 32, 1, bias=True)
    _bn_weights(raw, rng, "batch_norm2d_83", 64)

    bp = jax.tree.map(jnp.asarray, build_large_kernel_block(
        WeightMap(raw), 129, (137, 131, 134), (138, 132, 135),
        (139, 133, 136), 130, "batch_norm2d_83"))
    x = rng.normal(0, 1, (1, 64, 11, 11)).astype(np.float32)
    got = np.asarray(apply_large_kernel_block(
        bp, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))

    def tconv(y, name, shape, padding):
        w = torch.from_numpy(raw[f"{name}.w_0"].reshape(shape))
        b = torch.from_numpy(raw[f"{name}.b_0"])
        return F.conv2d(y, w, b, padding=padding)

    with torch.no_grad():
        t = torch.from_numpy(x)
        r = tconv(t, "conv2d_129", (32, 64, 1, 1), 0)

        def branch(names, ks):
            y = r
            for n, (kh, kw) in zip(names, ks):
                y = tconv(y, f"conv2d_{n}", (32, 32, kh, kw),
                          (kh // 2, kw // 2))
            return y

        s = branch((137, 131, 134), [(7, 7), (1, 7), (7, 1)]) + \
            branch((138, 132, 135), [(5, 5), (1, 5), (5, 1)]) + \
            branch((139, 133, 136), [(3, 3), (1, 3), (3, 1)])
        e = tconv(s, "conv2d_130", (64, 32, 1, 1), 0)
        e = F.relu(_t_bn(e, raw, "batch_norm2d_83"))
        exp = (t + e).numpy()
    np.testing.assert_allclose(got, np.transpose(exp, (0, 2, 3, 1)), atol=2e-4)


def test_server_rec_full_graph(rng):
    model = get_model("ppocrv5_server_rec")
    cfg = dataclasses.replace(model.default_cfg(), num_classes=97, input_w=160)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, 48, 160, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    assert out.shape == (1, 20, 97)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)


def test_server_det_full_graph(rng):
    model = get_model("ppocrv5_server_det")
    cfg = model.default_cfg()
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, 128, 128, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    assert out.shape == (1, 128, 128, 1)
    o = np.asarray(out)
    assert 0.0 <= o.min() and o.max() <= 1.0  # (shrink+thresh)/2 of sigmoids
