"""Numeric parity for RetinaFaceAntiCov: torch-functional oracle (MXNet-named
weights, mirroring retinafaceAntiCov.cpp:272-410 + decode.cu:110-149) vs the
fused engine over the same random weight set."""

import dataclasses

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models.retinaface_anticov import _BACKBONE, _TAPS

H = W = 320


def _oracle(Wts, x):
    t = lambda k: torch.from_numpy(np.asarray(Wts[k], np.float32))

    def bn(y, name, eps):
        return F.batch_norm(y, t(f"{name}_moving_mean"),
                            t(f"{name}_moving_var"), t(f"{name}_gamma"),
                            t(f"{name}_beta"), eps=eps)

    def cbr(y, name, stride=1, groups=1, relu=True):
        w = t(f"{name}_conv2d_weight")
        y = F.conv2d(y, w, None, stride, w.shape[-1] // 2, groups=groups)
        y = bn(y, f"{name}_batchnorm", 1e-3)
        return F.relu(y) if relu else y

    def cbbr(y, name, relu=True):
        w = t(f"{name}_weight")
        y = F.conv2d(y, w, t(f"{name}_bias"), 1, w.shape[-1] // 2)
        y = bn(y, f"{name}_bn", 2e-5)
        return F.relu(y) if relu else y

    def head(y, name):
        c1 = cbbr(y, f"{name}_conv1", relu=False)
        ctx = cbbr(y, f"{name}_context_conv1")
        c2 = cbbr(ctx, f"{name}_context_conv2", relu=False)
        c3 = cbbr(cbbr(ctx, f"{name}_context_conv3_1"),
                  f"{name}_context_conv3_2", relu=False)
        return F.relu(torch.cat([c1, c2, c3], 1))

    def pair_softmax(y, groups):
        b, c, h, w = y.shape
        z = y.reshape(b, c // groups, groups, h, w)
        return F.softmax(z, dim=1).reshape(b, c, h, w)

    taps = [None] * 3
    y = x
    cin = 3
    for (name, co, k, s, g) in _BACKBONE:
        y = cbr(y, name, stride=s, groups=(cin if g == -1 else 1))
        cin = co
        if name in _TAPS:
            taps[_TAPS[name]] = y
    c6, c12, cfin = taps
    up = lambda v: F.interpolate(v, scale_factor=2, mode="nearest")
    lat3 = cbbr(cfin, "rf_c3_lateral")
    aggr2 = cbbr(up(lat3) + cbbr(c12, "rf_c2_lateral"), "rf_c2_aggr")
    aggr1 = cbbr(up(aggr2) + cbbr(c6, "rf_c1_red_conv"), "rf_c1_aggr")
    feats = {8: aggr1, 16: aggr2, 32: lat3}
    anchors = {8: 16, 16: 64, 32: 256}
    boxes_all, conf_all, mask_all, lmk_all = [], [], [], []
    for s in (8, 16, 32):
        f = feats[s]
        h1 = head(f, f"rf_head_stride{s}")
        h2 = head(f, f"rf_head2_stride{s}")
        conv = lambda v, nm, co: F.conv2d(
            v, t(f"{nm}_weight"), t(f"{nm}_bias"))
        cls = pair_softmax(conv(h1, f"face_rpn_cls_score_stride{s}", 4), 2)
        bbox = conv(h1, f"face_rpn_bbox_pred_stride{s}", 8)
        lmk = conv(h1, f"face_rpn_landmark_pred_stride{s}", 20)
        typ = pair_softmax(conv(h2, f"face_rpn_type_score_stride{s}", 6), 2)
        # decode (decode.cu:110-149)
        cls, bbox, lmk, typ = [v.numpy().transpose(0, 2, 3, 1)
                               for v in (cls, bbox, lmk, typ)]
        b, h, w, _ = cls.shape
        cx = 7.5 + np.arange(w, dtype=np.float32)[None, None, :] * s
        cy = 7.5 + np.arange(h, dtype=np.float32)[None, :, None] * s
        bxs, cfs, mks, lms = [], [], [], []
        for k in range(2):
            size = anchors[s] * 2 / (k + 1)
            dx = bbox[..., 4 * k + 0] * size
            dy = bbox[..., 4 * k + 1] * size
            bw = size * np.exp(bbox[..., 4 * k + 2])
            bh = size * np.exp(bbox[..., 4 * k + 3])
            x1 = (cx + dx) - (bw - 1) / 2
            y1 = (cy + dy) - (bh - 1) / 2
            bxs.append(np.stack([x1, y1, x1 + bw, y1 + bh], -1))
            cfs.append(cls[..., 2 + k])
            mks.append(typ[..., 2 + k])
            lm = [(cx if i % 2 == 0 else cy) + lmk[..., 10 * k + i]
                  * 0.2 * size for i in range(10)]
            lms.append(np.stack(lm, -1))
        boxes_all.append(np.stack(bxs, 3).reshape(b, -1, 4))
        conf_all.append(np.stack(cfs, 3).reshape(b, -1))
        mask_all.append(np.stack(mks, 3).reshape(b, -1))
        lmk_all.append(np.stack(lms, 3).reshape(b, -1, 10))
    return (np.concatenate(boxes_all, 1), np.concatenate(conf_all, 1),
            np.concatenate(mask_all, 1), np.concatenate(lmk_all, 1))


def test_anticov_parity():
    model = get_model("retinaface-anticov")
    cfg = dataclasses.replace(model.default_cfg(), input_h=H, input_w=W,
                              postprocess="raw")
    wm = RandomWeightMap(seed=97, scale=0.03)
    params = model.build_params(wm, cfg)
    x = np.random.default_rng(98).uniform(-1, 1, (1, 3, H, W)).astype(
        np.float32)
    res = jax.jit(lambda p, v: model.apply(p, v, cfg))(
        jax.tree.map(jnp.asarray, params), x.transpose(0, 2, 3, 1))
    with torch.no_grad():
        exp_bx, exp_cf, exp_mk, exp_lm = _oracle(wm.raw,
                                                 torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_cf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["mask"]), exp_mk, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_bx,
                               rtol=1e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(res["landmarks"]), exp_lm,
                               rtol=1e-3, atol=0.5)
