"""Full two-stage numeric parity for Faster/Mask R-CNN R50-C4: torch
backbone/heads + numpy mirrors of the reference's RPN decode, one-pass NMS,
RoIAlign (scalar RoiAlign.cu port) and predictor decode, against the fused
engine (upgrades test_rcnn.py's smoke; ref rcnn/README.md:20 'same to
pytorch about 4 decimal places')."""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.core.params import WeightMap
from tensorrtx_tpu.models.rcnn import generate_anchors
from test_roi_dcn import ref_roi_align
from torch_refs.rcnn_torch import RcnnTorch
from torch_refs.yolo11_torch import randomize

H = W = 320
NC = 80


def iou_np(boxes):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    il = np.maximum(x1[:, None], x1[None, :])
    it = np.maximum(y1[:, None], y1[None, :])
    ir = np.minimum(x2[:, None], x2[None, :])
    ib = np.minimum(y2[:, None], y2[None, :])
    inter = np.maximum(ir - il, 0.0) * np.maximum(ib - it, 0.0)
    area = np.maximum(x2 - x1, 0.0) * np.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return np.where(inter > 0.0, inter / np.maximum(union, 1e-30), 0.0)


def nms_mask_np(iou, scores, classes, thresh, valid):
    n = len(scores)
    idx = np.arange(n)
    same = classes[:, None] == classes[None, :]
    higher = scores[None, :] > scores[:, None]
    tie = (scores[None, :] == scores[:, None]) & (idx[None, :] < idx[:, None])
    dom = (higher | tie) & same & valid[None, :]
    killed = np.any(dom & (iou > thresh), axis=1)
    return valid & ~killed


def decode_deltas_np(deltas, boxes, weights):
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    px = deltas[..., 0] / wx * w + cx
    py = deltas[..., 1] / wy * h + cy
    pw = np.exp(np.minimum(deltas[..., 2] / ww, 10.0)) * w
    ph = np.exp(np.minimum(deltas[..., 3] / wh, 10.0)) * h
    return np.stack([px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2], -1)


def clip_np(b):
    return np.stack([np.clip(b[..., 0], 0, W), np.clip(b[..., 1], 0, H),
                     np.clip(b[..., 2], 0, W), np.clip(b[..., 3], 0, H)], -1)


@pytest.fixture(scope="module")
def pair():
    tm = randomize(RcnnTorch(nc=NC, mask=True), seed=95).eval()
    with torch.no_grad():
        # trained-model scale for regressions: random-weight deltas would
        # blow past the exp clip and produce degenerate boxes everywhere
        h = tm.proposal_generator.rpn_head
        h.anchor_deltas.weight.mul_(0.02)
        h.anchor_deltas.bias.mul_(0.02)
        tm.roi_heads.box_predictor.bbox_pred.weight.mul_(0.02)
        tm.roi_heads.box_predictor.bbox_pred.bias.mul_(0.02)
    sd = {k: np.asarray(v.numpy(), np.float32)
          for k, v in tm.state_dict().items()}
    wm = WeightMap({k: v.ravel() for k, v in sd.items()})
    model = get_model("rcnn")
    cfg = dataclasses.replace(
        model.default_cfg(), task="mask", input_h=H, input_w=W,
        pre_nms_topk=300, post_nms_topk=16, detections_per_image=20,
        score_thresh=0.013)
    params = jax.tree.map(jnp.asarray, model.build_params(wm, cfg))
    x = np.random.default_rng(96).uniform(-1, 1, (1, 3, H, W)).astype(
        np.float32)
    res = jax.jit(lambda p, v: model.apply(p, v, cfg))(
        params, x.transpose(0, 2, 3, 1))
    return tm, cfg, x, res


def _oracle(tm, cfg, x):
    with torch.no_grad():
        feat = tm.features(torch.from_numpy(x))
        logits_t, deltas_t = tm.rpn(feat)
    fh, fw = feat.shape[-2:]
    logits = logits_t.numpy().transpose(0, 2, 3, 1).reshape(-1)
    deltas = deltas_t.numpy().transpose(0, 2, 3, 1).reshape(-1, 15, 4)
    anchors = generate_anchors()
    xs = np.arange(fw, dtype=np.float32) * 16
    ys = np.arange(fh, dtype=np.float32) * 16
    shift = np.stack([np.tile(xs, fh), np.repeat(ys, fw)], -1)
    anc = anchors[None] + np.concatenate([shift, shift], -1)[:, None, :]
    boxes = clip_np(decode_deltas_np(deltas, anc, (1, 1, 1, 1))).reshape(-1, 4)
    empty = ((boxes[:, 2] - boxes[:, 0]) <= 0) | \
            ((boxes[:, 3] - boxes[:, 1]) <= 0)
    scores = np.where(empty, -np.inf, logits)
    order = np.argsort(-scores, kind="stable")[:cfg.pre_nms_topk]
    top_sc, top_bx = scores[order], boxes[order]
    keep = nms_mask_np(iou_np(top_bx), top_sc, np.zeros_like(top_sc),
                       cfg.rpn_nms_thresh, np.isfinite(top_sc))
    sc2 = np.where(keep, top_sc, -np.inf)
    sel = np.argsort(-sc2, kind="stable")[:cfg.post_nms_topk]
    props = top_bx[sel]

    featn = feat.numpy()[0].transpose(1, 2, 0)
    pooled = np.stack([ref_roi_align(featn, p, 1.0 / 16, 14, 14, 2)
                       for p in props])
    with torch.no_grad():
        cls_sc, dd = tm.box_head(torch.from_numpy(
            pooled.transpose(0, 3, 1, 2)))
    cls_sc = cls_sc.numpy()
    dd = dd.numpy().reshape(-1, NC, 4)
    bx = clip_np(decode_deltas_np(dd, props[:, None, :], (10, 10, 5, 5)))
    fg = cls_sc[:, :-1]
    best = fg.argmax(-1)
    best_sc = fg.max(-1)
    best_bx = bx[np.arange(len(best)), best]

    # final select + one-pass NMS + compaction (ops/nms.select_and_nms)
    cand = best_sc >= cfg.score_thresh
    masked = np.where(cand, best_sc, -1.0)
    o2 = np.argsort(-masked, kind="stable")[:cfg.detections_per_image]
    t_sc, t_bx, t_cl = masked[o2], best_bx[o2], best[o2]
    valid = t_sc >= cfg.score_thresh
    keep2 = nms_mask_np(iou_np(t_bx), t_sc, t_cl.astype(np.float32),
                        cfg.nms_thresh, valid)
    o3 = np.argsort(~keep2, kind="stable")
    return (props, t_bx[o3], np.where(keep2, t_sc, 0)[o3], t_cl[o3],
            int(keep2.sum()))


def test_rcnn_two_stage_parity(pair):
    tm, cfg, x, res = pair
    props, exp_bx, exp_sc, exp_cl, exp_n = _oracle(tm, cfg, x)
    n = int(res["count"][0])
    assert n == exp_n and n > 0
    np.testing.assert_allclose(np.asarray(res["scores"][0][:n]),
                               exp_sc[:n], atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"][0][:n]),
                               exp_bx[:n], atol=0.5)
    assert (np.asarray(res["classes"][0][:n]) == exp_cl[:n]).all()


def test_rcnn_mask_head_parity(pair):
    tm, cfg, x, res = pair
    _, exp_bx, _, exp_cl, exp_n = _oracle(tm, cfg, x)
    n = int(res["count"][0])
    feat = tm.features(torch.from_numpy(x)).detach().numpy()[0].transpose(
        1, 2, 0)
    pooled = np.stack([ref_roi_align(feat, b, 1.0 / 16, 14, 14, 2)
                       for b in exp_bx[:n]])
    with torch.no_grad():
        z = tm.roi_heads.res5(torch.from_numpy(pooled.transpose(0, 3, 1, 2)))
        z = torch.relu(tm.roi_heads.mask_head.deconv(z))
        ml = tm.roi_heads.mask_head.predictor(z).numpy()
    got = np.asarray(res["masks"])[0]
    for i in range(n):
        exp = 1 / (1 + np.exp(-ml[i, int(exp_cl[i])]))
        np.testing.assert_allclose(got[i], exp, atol=5e-3)
