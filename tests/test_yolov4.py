"""YOLOv4 parity vs a table-driven torch CSPDarknet reference."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.yolov4 import ANCHORS, STRIDES, _STAGES
from torch_refs.yolo11_torch import randomize

H = W = 256


class CB(tnn.Module):
    def __init__(self, ci, co, k, s=1, act="mish"):
        super().__init__()
        self.Conv2d = tnn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.BatchNorm2d = tnn.BatchNorm2d(co)
        self.act = act

    def forward(self, x):
        y = self.BatchNorm2d(self.Conv2d(x))
        if self.act == "mish":
            return y * torch.tanh(F.softplus(y))
        return F.leaky_relu(y, 0.1)


class Det(tnn.Module):
    def __init__(self, ci, co):
        super().__init__()
        self.Conv2d = tnn.Conv2d(ci, co, 1)

    def forward(self, x):
        return self.Conv2d(x)


LEAKY = [(105, 512, 1024, 1), (106, 1024, 512, 3), (107, 512, 1024, 1),
         (114, 512, 2048, 1), (115, 1024, 512, 3), (116, 512, 1024, 1),
         (117, 256, 512, 1), (120, 256, 512, 1), (122, 256, 512, 1),
         (123, 512, 256, 3), (124, 256, 512, 1), (125, 512, 256, 3),
         (126, 256, 512, 1), (127, 128, 256, 1), (130, 128, 256, 1),
         (132, 128, 256, 1), (133, 256, 128, 3), (134, 128, 256, 1),
         (135, 256, 128, 3), (136, 128, 256, 1), (137, 256, 128, 3),
         (141, 256, 128, 3), (143, 256, 512, 1), (144, 512, 256, 3),
         (145, 256, 512, 1), (146, 512, 256, 3), (147, 256, 512, 1),
         (148, 512, 256, 3), (152, 512, 256, 3), (154, 512, 1024, 1),
         (155, 1024, 512, 3), (156, 512, 1024, 1), (157, 1024, 512, 3),
         (158, 512, 1024, 1), (159, 1024, 512, 3)]


class TorchYolov4(tnn.Module):
    def __init__(self, nc=80):
        super().__init__()
        no = 3 * (5 + nc)
        ml = {"0": CB(3, 32, 3)}
        cin = 32
        for (down, ch, n, mid, a, bidx, post, trans) in _STAGES:
            half = ch if down == 1 else ch // 2
            ml[str(down)] = CB(cin, ch, 3, 2)
            ml[str(a)] = CB(ch, half, 1)
            ml[str(bidx)] = CB(ch, half, 1)
            for i in range(n):
                ml[str(bidx + 1 + 3 * i)] = CB(half, mid, 1)
                ml[str(bidx + 2 + 3 * i)] = CB(mid, half, 3)
            ml[str(post)] = CB(half, half, 1)
            ml[str(trans)] = CB(2 * half, ch, 1)
            cin = ch
        for i, co, ci, k in LEAKY:
            ml[str(i)] = CB(ci, co, k, 2 if i in (141, 152) else 1, act="leaky")
        for i, ci in ((138, 256), (149, 512), (160, 1024)):
            ml[str(i)] = Det(ci, no)
        self.module_list = tnn.ModuleDict(ml)

    def forward(self, x):
        m = self.module_list
        y = m["0"](x)
        outs = []
        for (down, ch, n, mid, a, bidx, post, trans) in _STAGES:
            d = m[str(down)](y)
            ab = m[str(a)](d)
            y = m[str(bidx)](d)
            for i in range(n):
                y = y + m[str(bidx + 2 + 3 * i)](m[str(bidx + 1 + 3 * i)](y))
            y = m[str(post)](y)
            y = m[str(trans)](torch.cat([y, ab], 1))
            outs.append(y)
        l54, l85, l116_in = outs[2], outs[3], outs[4]
        y = m["107"](m["106"](m["105"](l116_in)))
        spp = torch.cat([F.max_pool2d(y, 13, 1, 6), F.max_pool2d(y, 9, 1, 4),
                         F.max_pool2d(y, 5, 1, 2), y], 1)
        y = m["116"](m["115"](m["114"](spp)))
        l116 = y
        u = F.interpolate(m["117"](y), scale_factor=2, mode="nearest")
        y = torch.cat([m["120"](l85), u], 1)
        for i in ("122", "123", "124", "125", "126"):
            y = m[i](y)
        l126 = y
        u = F.interpolate(m["127"](y), scale_factor=2, mode="nearest")
        y = torch.cat([m["130"](l54), u], 1)
        for i in ("132", "133", "134", "135", "136"):
            y = m[i](y)
        l136 = y
        d8 = m["138"](m["137"](y))
        y = torch.cat([m["141"](l136), l126], 1)
        for i in ("143", "144", "145", "146", "147"):
            y = m[i](y)
        l147 = y
        d16 = m["149"](m["148"](y))
        y = torch.cat([m["152"](l147), l116], 1)
        for i in ("154", "155", "156", "157", "158"):
            y = m[i](y)
        d32 = m["160"](m["159"](y))
        return d8, d16, d32


def test_yolov4_parity(tmp_path, rng):
    from test_yolov3 import np_decode_v3

    tm = randomize(TorchYolov4(), seed=77).eval()
    wts = tmp_path / "v4.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("yolov4", str(wts), input_h=H, input_w=W,
                       postprocess="raw")
    x = rng.uniform(0, 1, (1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        levels = [t.numpy() for t in tm(torch.from_numpy(x))]
    # v4 uses the same decode as v3 but with its own anchors/stride order
    import tensorrtx_tpu.models.yolov4 as v4mod
    import test_yolov3 as t3

    old = t3.ANCHORS, t3.STRIDES
    t3.ANCHORS, t3.STRIDES = ANCHORS, STRIDES
    try:
        eb, ec, _ = np_decode_v3(levels)
    finally:
        t3.ANCHORS, t3.STRIDES = old
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(res["conf"]), ec, atol=2e-3)
    got_b = np.asarray(res["boxes"])
    # random weights push exp(tw) to overflow on dead cells; compare only
    # plausibly-sized boxes (the decode formula is identical)
    mask = (ec > 1e-4) & np.isfinite(eb).all(-1) & (np.abs(eb) < 1e4).all(-1)
    assert mask.sum() > 100
    np.testing.assert_allclose(got_b[mask], eb[mask], atol=0.5, rtol=1e-2)
