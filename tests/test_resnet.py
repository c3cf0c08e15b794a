"""ResNet family parity vs torch (reference methodology: rcnn/README.md:20
'same to pytorch about 4 decimal places')."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs.resnet_torch import make
from torch_refs.yolo11_torch import randomize


@pytest.mark.parametrize("variant", ["resnet18", "resnet50", "resnext50_32x4d",
                                     "wide_resnet50_2"])
def test_resnet_parity(variant, tmp_path, rng):
    tm = randomize(make(variant, num_classes=10), seed=5).eval()
    wts = tmp_path / f"{variant}.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("resnet", str(wts), variant=variant, num_classes=10,
                       input_h=64, input_w=64)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    # random weights make deep/wide variants produce large activations;
    # scale tolerance to output magnitude (parity target ~1e-4 relative).
    tol = max(3e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)
