"""YOLO11 parity: torch reference graph → .wts → tensorrtx_tpu engine.

Mirrors the reference's numeric-parity methodology (SURVEY.md §4): identical
weights, identical input, outputs must agree.
"""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.yolo11_torch import Yolo11Torch, randomize

H = W = 160  # small input for test speed; strides 8/16/32 still exercised


def np_decode(head_out, nc=80, reg_max=16, strides=(8, 16, 32)):
    """Reference decode semantics in plain numpy (yololayer.cu:177-225)."""
    boxes_all, conf_all, cls_all = [], [], []
    for (box, cls), s in zip(head_out, strides):
        b, c4, gh, gw = box.shape
        bd = box.reshape(b, 4, reg_max, gh * gw)
        p = np.exp(bd - bd.max(axis=2, keepdims=True))
        p = p / p.sum(axis=2, keepdims=True)
        ltrb = (p * np.arange(reg_max)[None, None, :, None]).sum(axis=2)  # (b,4,N)
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


@pytest.fixture(scope="module")
def det_pair(tmp_path_factory):
    tm = randomize(Yolo11Torch(scale="n", nc=80), seed=1).eval()
    wts = tmp_path_factory.mktemp("y11") / "y11n.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolo11", str(wts), scale="n", input_h=H, input_w=W,
                       postprocess="raw")
    return tm, eng


def test_yolo11_det_raw_parity(det_pair, rng):
    tm, eng = det_pair
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x))
    head = [(b.numpy(), c.numpy()) for b, c in out["head"]]
    exp_boxes, exp_conf, exp_cls = np_decode(head)

    res = eng(np.transpose(x, (0, 2, 3, 1)))
    got_boxes = np.asarray(res["boxes"])
    got_conf = np.asarray(res["conf"])
    got_cls = np.asarray(res["cls"])

    np.testing.assert_allclose(got_conf, exp_conf, atol=2e-3)
    np.testing.assert_allclose(got_boxes, exp_boxes, atol=0.1)
    agree = (got_cls[0].astype(int) == exp_cls[0]).mean()
    assert agree > 0.99


def test_yolo11_det_fused_nms_runs(det_pair, rng):
    tm, eng = det_pair
    import dataclasses

    from tensorrtx_tpu.core.engine import Engine

    cfg = dataclasses.replace(eng.cfg, postprocess="nms", conf_thresh=0.01)
    eng2 = Engine("yolo11", eng.params, cfg)
    x = rng.uniform(0, 1, (2, H, W, 3)).astype(np.float32)
    out = eng2(x)
    assert out["boxes"].shape == (2, cfg.max_det, 4)
    assert out["count"].shape == (2,)
    n = int(out["count"][0])
    v = np.asarray(out["valid"][0])
    assert v[:n].all() and not v[n:].any()
    s = np.asarray(out["scores"][0])
    assert (np.diff(s[:n]) <= 1e-6).all()  # sorted desc


def test_yolo11_cls_parity(tmp_path, rng):
    import torch.nn.functional as F

    from torch_refs.yolo11_torch import C2PSA, Conv

    class ClsTorch(torch.nn.Module):
        def __init__(self, nc=37):
            super().__init__()
            base = Yolo11Torch(scale="n", nc=80)
            layers = list(base.model[:9])

            class Classify(torch.nn.Module):
                def __init__(self, c1, nc):
                    super().__init__()
                    self.conv = Conv(c1, 1280, 1)
                    self.linear = torch.nn.Linear(1280, nc)

                def forward(self, x):
                    return self.linear(self.conv(x).mean((2, 3)))

            layers.append(C2PSA(256, 256, 1))
            layers.append(Classify(256, nc))
            self.model = torch.nn.ModuleList(layers)

        def forward(self, x):
            for i, m in enumerate(self.model):
                x = m(x)
            return x

    tm = randomize(ClsTorch(), seed=3).eval()
    wts = tmp_path / "cls.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolo11", str(wts), scale="n", task="cls",
                       num_classes=37, input_h=64, input_w=64)
    x = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-3)
