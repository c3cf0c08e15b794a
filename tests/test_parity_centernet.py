"""Full-graph numeric parity for CenterNet DLA34+DCNv2: torch reference
(explicit-bilinear DCN) → .wts → engine, identical weights."""

import numpy as np
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.centernet_torch import CenterNetTorch, DCN
from torch_refs.yolo11_torch import randomize


def test_centernet_full_graph_parity(tmp_path, rng):
    tm = randomize(CenterNetTorch(nc=80), seed=91).eval()
    # DCN weights are raw Parameters (not nn.Conv2d) — randomize by hand
    g = torch.Generator().manual_seed(92)
    with torch.no_grad():
        for mod in tm.modules():
            if isinstance(mod, DCN):
                mod.weight.normal_(0, 0.05, generator=g)
                mod.bias.normal_(0, 0.05, generator=g)
                # keep learned offsets small (trained-model range ~±1 px):
                # random O(1) offsets would make bilinear sampling diverge
                # between implementations only at fp tie boundaries anyway,
                # but small offsets keep the comparison numerically tight
                mod.conv_offset_mask.weight.mul_(0.2)
                mod.conv_offset_mask.bias.mul_(0.2)
    wts = tmp_path / "ctdet.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("centernet", str(wts), input_h=128, input_w=128)
    x = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    res = eng(np.transpose(x, (0, 2, 3, 1)))
    for key in ("hm", "wh", "reg"):
        got = np.asarray(res[key]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, ref[key].numpy(), atol=5e-3,
                                   err_msg=key)
    # decode sanity on the parity-checked maps
    assert np.asarray(res["boxes"]).shape[1] == 100
    assert np.isfinite(np.asarray(res["boxes"])).all()
