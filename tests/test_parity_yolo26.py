"""Full-graph numeric parity for YOLO26 det/obb/cls (NMS-free one2one head,
direct ltrb regression): torch reference → .wts → engine, identical weights
(upgrades the shape-smoke in test_yolo26.py / test_detector_matrix.py)."""

import numpy as np
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import randomize
from torch_refs.yolo26_torch import Yolo26Torch

H = W = 160


def np_decode26(head_out, nc=80, strides=(8, 16, 32)):
    """NMS-free decode (yolo26/src/model.cpp:230-330): no DFL — raw ltrb;
    x1y1 = (grid+0.5) - lt, x2y2 = (grid+0.5) + rb, × stride."""
    boxes_all, conf_all, cls_all = [], [], []
    for (box, cls), s in zip(head_out, strides):
        b, _, gh, gw = box.shape
        ltrb = box.reshape(b, 4, gh * gw)
        cols = np.tile(np.arange(gw), gh).astype(np.float32)
        rows = np.repeat(np.arange(gh), gw).astype(np.float32)
        x1 = (cols + 0.5 - ltrb[:, 0]) * s
        y1 = (rows + 0.5 - ltrb[:, 1]) * s
        x2 = (cols + 0.5 + ltrb[:, 2]) * s
        y2 = (rows + 0.5 + ltrb[:, 3]) * s
        boxes_all.append(np.stack([x1, y1, x2, y2], -1))
        sig = 1 / (1 + np.exp(-cls.reshape(b, nc, gh * gw)))
        conf_all.append(sig.max(axis=1))
        cls_all.append(sig.argmax(axis=1))
    return (np.concatenate(boxes_all, 1), np.concatenate(conf_all, 1),
            np.concatenate(cls_all, 1))


def _pair(tmp_path, seed, task="det", **kw):
    tm = randomize(Yolo26Torch(task=task, nc=kw.get("num_classes", 80)),
                   seed=seed).eval()
    wts = tmp_path / "y26.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolo26", str(wts), scale="n", task=task,
                       input_h=H, input_w=W, postprocess="raw", **kw)
    x = np.random.default_rng(seed).uniform(0, 1, (1, 3, H, W)).astype(
        np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    if task == "cls":
        return out, np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    return out, eng(np.transpose(x, (0, 2, 3, 1)))


def test_yolo26_det_parity(tmp_path):
    out, res = _pair(tmp_path, seed=41)
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, exp_cls = np_decode26(head)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    np.testing.assert_allclose(np.asarray(res["boxes"]), exp_boxes, atol=0.1)
    agree = (np.asarray(res["cls"])[0].astype(int) == exp_cls[0]).mean()
    assert agree > 0.99


def test_yolo26_obb_parity(tmp_path):
    out, res = _pair(tmp_path, seed=42, task="obb")
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    _, exp_conf, _ = np_decode26(head)
    np.testing.assert_allclose(np.asarray(res["conf"]), exp_conf, atol=2e-3)
    angs = []
    for t in out["cv4"]:
        a = t.numpy()
        b = a.shape[0]
        angs.append(a.reshape(b, -1))
    exp_ang = (1 / (1 + np.exp(-np.concatenate(angs, 1))) - 0.25) * np.pi
    np.testing.assert_allclose(np.asarray(res["extras"])[..., 0], exp_ang,
                               atol=2e-3)


def test_yolo26_cls_parity(tmp_path):
    ref, got = _pair(tmp_path, seed=43, task="cls", num_classes=37)
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-3)
