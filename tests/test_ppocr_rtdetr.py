"""RT-DETR: deformable attention parity vs a direct numpy port of the CUDA
kernel semantics (ppocrv5_rtdetr_layer.cu:24-104), plus full-graph smoke."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.ops.deform_attn import ms_deform_attn


def _numpy_deform_attn(value, reference, offsets, weights, level_sizes):
    """Literal loop transcription of deformableAttentionKernel semantics."""
    L, heads, hd = value.shape
    Q = reference.shape[0]
    starts = []
    s = 0
    for (h, w) in level_sizes:
        starts.append(s)
        s += h * w
    out = np.zeros((Q, heads, hd), np.float32)
    for q in range(Q):
        cx, cy, bw, bh = reference[q]
        for head in range(heads):
            for lvl, (hh, ww) in enumerate(level_sizes):
                for pt in range(4):
                    ox, oy = offsets[q, head, lvl, pt]
                    sx = cx + ox * bw * 0.5 / 4
                    sy = cy + oy * bh * 0.5 / 4
                    px = sx * ww - 0.5
                    py = sy * hh - 0.5
                    x0, y0 = int(np.floor(px)), int(np.floor(py))
                    wx1, wy1 = px - x0, py - y0
                    acc = np.zeros(hd, np.float32)
                    for (xi, yi, wt) in ((x0, y0, (1 - wx1) * (1 - wy1)),
                                         (x0 + 1, y0, wx1 * (1 - wy1)),
                                         (x0, y0 + 1, (1 - wx1) * wy1),
                                         (x0 + 1, y0 + 1, wx1 * wy1)):
                        if 0 <= xi < ww and 0 <= yi < hh:
                            acc += value[starts[lvl] + yi * ww + xi,
                                         head] * wt
                    out[q, head] += weights[q, head, lvl, pt] * acc
    return out.reshape(Q, heads * hd)


def test_deform_attn_matches_kernel_semantics(rng):
    level_sizes = [(8, 8), (4, 4), (2, 2)]
    L = sum(h * w for h, w in level_sizes)
    heads, hd, Q = 2, 3, 5
    value = rng.normal(0, 1, (L, heads, hd)).astype(np.float32)
    reference = rng.uniform(0.1, 0.9, (Q, 4)).astype(np.float32)
    offsets = rng.normal(0, 2, (Q, heads, 3, 4, 2)).astype(np.float32)
    weights = rng.uniform(0, 1, (Q, heads, 3, 4)).astype(np.float32)
    got = np.asarray(ms_deform_attn(jnp.asarray(value),
                                    jnp.asarray(reference),
                                    jnp.asarray(offsets),
                                    jnp.asarray(weights), level_sizes))
    exp = _numpy_deform_attn(value, reference, offsets, weights, level_sizes)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_rtdetr_full_graph(rng):
    model = get_model("rt_detr_l_wired_table_cell_det")
    cfg = dataclasses.replace(model.default_cfg(), input_h=224, input_w=224)
    params = jax.tree.map(jnp.asarray,
                          model.build_params(RandomWeightMap(), cfg))
    x = rng.normal(0, 0.5, (1, 224, 224, 3)).astype(np.float32)
    out = jax.jit(lambda p, v: model.apply(p, v, cfg))(params, x)
    assert out["boxes"].shape == (1, 300, 4)
    assert out["scores"].shape == (1, 300, cfg.num_classes)
    b = np.asarray(out["boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    dets = model.postprocess(out, dataclasses.replace(cfg, score_thresh=0.0))
    assert len(dets) == 300
