"""Full-graph numeric parity: refinedet (VGG+ARM/TCB/ODM) and
retinaface-r50 (resnet50+FPN+SSH+decode), torch reference → .wts → engine."""

import numpy as np
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.refinedet_torch import RefineDetTorch
from torch_refs.retinaface_torch import RetinaFaceTorch
from torch_refs.yolo11_torch import randomize


def test_refinedet_full_graph_parity(tmp_path, rng):
    tm = randomize(RefineDetTorch(nc=25), seed=81).eval()
    # keep the learned L2Norm scales O(10) like the trained model
    with torch.no_grad():
        tm.conv4_3_L2Norm.weight.fill_(10.0)
        tm.conv5_3_L2Norm.weight.fill_(8.0)
    wts = tmp_path / "refinedet.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("refinedet", str(wts), input_h=320, input_w=320)
    x = rng.uniform(-1, 1, (1, 3, 320, 320)).astype(np.float32)
    with torch.no_grad():
        arm_loc, arm_conf, odm_loc, odm_conf = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    # deep VGG stack + O(10) L2Norm scales: fp accumulation-order noise
    # reaches ~6e-3 on O(2) loc values; conf (softmaxed) stays tight
    np.testing.assert_allclose(np.asarray(res["arm_loc"]), arm_loc.numpy(),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(res["arm_conf"]), arm_conf.numpy(),
                               atol=2e-3)
    # random-weight TCB deconv chain yields O(1e3) odm logits: relative check
    np.testing.assert_allclose(np.asarray(res["odm_loc"]), odm_loc.numpy(),
                               rtol=2e-3, atol=0.05)
    # softmax over O(1e3) random-weight logits: rare borderline cells move
    np.testing.assert_allclose(np.asarray(res["odm_conf"]), odm_conf.numpy(),
                               atol=1e-2)


def np_decode_rf(levels, input_h, input_w):
    """decode.cu:110-175 in numpy over torch NCHW level outputs."""
    anchors = ((16, 32), (64, 128), (256, 512))
    var = (0.1, 0.2)
    all_boxes, all_conf, all_lmk = [], [], []
    for (bbox, cls, lmk), anc in zip(levels, anchors):
        b, _, h, w = bbox.shape
        bb = bbox.transpose(0, 2, 3, 1).reshape(b, h, w, 2, 4)
        cl = cls.transpose(0, 2, 3, 1).reshape(b, h, w, 2, 2)
        lm = lmk.transpose(0, 2, 3, 1).reshape(b, h, w, 2, 10)
        e = np.exp(cl - cl.max(-1, keepdims=True))
        conf = (e / e.sum(-1, keepdims=True))[..., 1]
        px = ((np.arange(w) + 0.5) / w)[None, None, :, None]
        py = ((np.arange(h) + 0.5) / h)[None, :, None, None]
        pw = np.asarray(anc, np.float32)[None, None, None, :] / input_w
        ph = np.asarray(anc, np.float32)[None, None, None, :] / input_h
        cx = px + bb[..., 0] * var[0] * pw
        cy = py + bb[..., 1] * var[0] * ph
        bw = pw * np.exp(bb[..., 2] * var[1])
        bh = ph * np.exp(bb[..., 3] * var[1])
        x1 = (cx - bw / 2) * input_w
        y1 = (cy - bh / 2) * input_h
        boxes = np.stack([x1, y1, x1 + bw * input_w, y1 + bh * input_h], -1)
        lmx = (px[..., None] + lm[..., 0::2] * var[0] * pw[..., None]) * input_w
        lmy = (py[..., None] + lm[..., 1::2] * var[0] * ph[..., None]) * input_h
        lms = np.stack([lmx, lmy], -1).reshape(b, h, w, 2, 10)
        n = h * w * 2
        all_boxes.append(boxes.reshape(b, n, 4))
        all_conf.append(conf.reshape(b, n))
        all_lmk.append(lms.reshape(b, n, 10))
    return (np.concatenate(all_boxes, 1), np.concatenate(all_conf, 1),
            np.concatenate(all_lmk, 1))


def test_retinaface_full_graph_parity(tmp_path, rng):
    tm = randomize(RetinaFaceTorch(), seed=82).eval()
    # keep raw box/landmark regressions O(1) (trained-model range): random
    # head weights otherwise push exp(0.2*t) decode to inf
    with torch.no_grad():
        for h in list(tm.BboxHead) + list(tm.LandmarkHead):
            h.conv1x1.weight.mul_(0.002)
            h.conv1x1.bias.mul_(0.002)
    wts = tmp_path / "rf50.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("retinaface", str(wts), input_h=320, input_w=320,
                       postprocess="raw")
    x = rng.uniform(-1, 1, (1, 3, 320, 320)).astype(np.float32)
    with torch.no_grad():
        levels = [(a.numpy(), b.numpy(), c.numpy())
                  for a, b, c in tm(torch.from_numpy(x))]
    exp_boxes, exp_conf, exp_lmk = np_decode_rf(levels, 320, 320)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    # softmax of random-weight logits: rare borderline cells shift ~8e-3
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=1e-2)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.2)
    np.testing.assert_allclose(np.asarray(res["landmarks"]), exp_lmk,
                               atol=0.2)
