"""YOLOv3 (plain + spp) parity vs a torch Darknet built from the same table."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.yolov3 import ANCHORS, STAGES, STRIDES
from torch_refs.yolo11_torch import randomize

H = W = 256


class CBL(tnn.Module):
    def __init__(self, ci, co, k, s=1):
        super().__init__()
        self.Conv2d = tnn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.BatchNorm2d = tnn.BatchNorm2d(co)

    def forward(self, x):
        return F.leaky_relu(self.BatchNorm2d(self.Conv2d(x)), 0.1)


class Head(tnn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.Conv2d = tnn.Conv2d(ci, co, 1)

    def forward(self, x):
        return self.Conv2d(x)


class TorchYolov3(tnn.Module):
    def __init__(self, nc=80, spp=False):
        super().__init__()
        self.spp = spp
        no = 3 * (5 + nc)
        ml = {}
        ml["0"] = CBL(3, 32, 3)
        cin = 32
        for down, ch, n in STAGES:
            ml[str(down)] = CBL(cin, ch, 3, 2)
            for i in range(n):
                ml[str(down + 1 + 3 * i)] = CBL(ch, ch // 2, 1)
                ml[str(down + 2 + 3 * i)] = CBL(ch // 2, ch, 3)
            cin = ch
        if not spp:
            seq = [(75, 512, 1024, 1), (76, 1024, 512, 3), (77, 512, 1024, 1),
                   (78, 1024, 512, 3), (79, 512, 1024, 1), (80, 1024, 512, 3)]
            det0, rmid, det1, rsmall, det2 = 81, 84, 93, 96, 105
            h1 = [(87, 256, 768, 1), (88, 512, 256, 3), (89, 256, 512, 1),
                  (90, 512, 256, 3), (91, 256, 512, 1), (92, 512, 256, 3)]
            h2 = [(99, 128, 384, 1), (100, 256, 128, 3), (101, 128, 256, 1),
                  (102, 256, 128, 3), (103, 128, 256, 1), (104, 256, 128, 3)]
        else:
            seq = [(75, 512, 1024, 1), (76, 1024, 512, 3), (77, 512, 1024, 1),
                   (84, 512, 2048, 1), (85, 1024, 512, 3), (86, 512, 1024, 1),
                   (87, 1024, 512, 3)]
            det0, rmid, det1, rsmall, det2 = 88, 91, 100, 103, 112
            h1 = [(94, 256, 768, 1), (95, 512, 256, 3), (96, 256, 512, 1),
                  (97, 512, 256, 3), (98, 256, 512, 1), (99, 512, 256, 3)]
            h2 = [(106, 128, 384, 1), (107, 256, 128, 3), (108, 128, 256, 1),
                  (109, 256, 128, 3), (110, 128, 256, 1), (111, 256, 128, 3)]
        self.h0_idx = [str(i) for i, *_ in seq]
        self.h1_idx = [str(i) for i, *_ in h1]
        self.h2_idx = [str(i) for i, *_ in h2]
        for i, co, ci, k in seq + h1 + h2:
            ml[str(i)] = CBL(ci, co, k)
        ml[str(det0)] = Head(1024, no)
        ml[str(rmid)] = CBL(512, 256, 1)
        ml[str(det1)] = Head(512, no)
        ml[str(rsmall)] = CBL(256, 128, 1)
        ml[str(det2)] = Head(256, no)
        self.det_idx = (str(det0), str(det1), str(det2))
        self.r_idx = (str(rmid), str(rsmall))
        self.module_list = tnn.ModuleDict(ml)

    def forward(self, x):
        m = self.module_list
        y = m["0"](x)
        feats = []
        for down, ch, n in STAGES:
            y = m[str(down)](y)
            for i in range(n):
                y = y + m[str(down + 2 + 3 * i)](m[str(down + 1 + 3 * i)](y))
            feats.append(y)
        c3, c4, c5 = feats[2], feats[3], feats[4]
        h = c5
        route_i0 = 5 if self.spp else 4
        for i, idx in enumerate(self.h0_idx):
            h = m[idx](h)
            if self.spp and i == 2:
                h = torch.cat([F.max_pool2d(h, 13, 1, 6),
                               F.max_pool2d(h, 9, 1, 4),
                               F.max_pool2d(h, 5, 1, 2), h], 1)
            if i == route_i0:
                r0 = h
        d0 = m[self.det_idx[0]](h)
        u = F.interpolate(m[self.r_idx[0]](r0), scale_factor=2, mode="nearest")
        h = torch.cat([u, c4], 1)
        for i, idx in enumerate(self.h1_idx):
            h = m[idx](h)
            if i == 4:
                r1 = h
        d1 = m[self.det_idx[1]](h)
        u = F.interpolate(m[self.r_idx[1]](r1), scale_factor=2, mode="nearest")
        h = torch.cat([u, c3], 1)
        for idx in self.h2_idx:
            h = m[idx](h)
        d2 = m[self.det_idx[2]](h)
        return d0, d1, d2


def np_decode_v3(levels, nc=80, ignore=0.1):
    sig = lambda v: 1 / (1 + np.exp(-v))
    boxes, confs, clss = [], [], []
    for li, raw in enumerate(levels):
        b, c, h, w = raw.shape
        s = STRIDES[li]
        r = raw.reshape(b, 3, 5 + nc, h, w)
        cols = np.arange(w)[None, None, None, :]
        rows = np.arange(h)[None, None, :, None]
        cx = (cols + sig(r[:, :, 0])) * s
        cy = (rows + sig(r[:, :, 1])) * s
        bw = np.exp(r[:, :, 2]) * ANCHORS[li, :, 0][None, :, None, None]
        bh = np.exp(r[:, :, 3]) * ANCHORS[li, :, 1][None, :, None, None]
        obj = sig(r[:, :, 4])
        cls = sig(r[:, :, 5:])
        conf = np.where(obj >= ignore, obj * cls.max(2), 0.0)
        bx = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1)
        boxes.append(bx.transpose(0, 2, 3, 1, 4).reshape(b, -1, 4))
        confs.append(conf.transpose(0, 2, 3, 1).reshape(b, -1))
        clss.append(cls.argmax(2).transpose(0, 2, 3, 1).reshape(b, -1))
    return (np.concatenate(boxes, 1), np.concatenate(confs, 1),
            np.concatenate(clss, 1))


def _run(spp, tmp_path, rng, seed):
    tm = randomize(TorchYolov3(spp=spp), seed=seed).eval()
    wts = tmp_path / "v3.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov3", str(wts), spp=spp, input_h=H, input_w=W,
                       postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        levels = [t.numpy() for t in tm(torch.from_numpy(x))]
    eb, ec, _ = np_decode_v3(levels)
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), ec, atol=2e-3)
    got_b = np.asarray(res["boxes"])
    mask = ec > 1e-4  # exp(tw) box dims are meaningless at dead cells
    np.testing.assert_allclose(got_b[mask], eb[mask], atol=0.5)


def test_yolov3_parity(tmp_path, rng):
    _run(False, tmp_path, rng, 71)


def test_yolov3_spp_parity(tmp_path, rng):
    _run(True, tmp_path, rng, 72)
