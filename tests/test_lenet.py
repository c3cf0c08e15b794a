"""LeNet-5 end-to-end parity vs PyTorch (the reference's de-facto test:
tutorials/getting_started.md:91-105 — 'the output should be same')."""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts


class TorchLeNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(1, 6, 5)
        self.conv2 = tnn.Conv2d(6, 16, 5)
        self.fc1 = tnn.Linear(16 * 5 * 5, 120)
        self.fc2 = tnn.Linear(120, 84)
        self.fc3 = tnn.Linear(84, 10)

    def forward(self, x):
        x = F.avg_pool2d(F.relu(self.conv1(x)), 2, 2)
        x = F.avg_pool2d(F.relu(self.conv2(x)), 2, 2)
        x = x.flatten(1)
        x = F.relu(self.fc1(x))
        x = F.relu(self.fc2(x))
        return F.softmax(self.fc3(x), dim=-1)


@pytest.fixture(scope="module")
def lenet_pair(tmp_path_factory):
    torch.manual_seed(0)
    model = TorchLeNet().eval()
    wts = tmp_path_factory.mktemp("lenet") / "lenet.wts"
    state_dict_to_wts(str(wts), model.state_dict())
    engine = build_engine("lenet", str(wts))
    return model, engine


def test_lenet_parity(lenet_pair, rng):
    model, engine = lenet_pair
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(x)).numpy()
    out = np.asarray(engine(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_lenet_reference_asset(lenet_pair):
    """Run the bundled MNIST digit image like lenet.cpp:301-306 does."""
    import os

    model, engine = lenet_pair
    pgm = "/root/reference/assets/6.pgm"
    if not os.path.exists(pgm):
        pytest.skip("reference assets unavailable")
    from PIL import Image

    img = np.asarray(Image.open(pgm).resize((32, 32)), dtype=np.float32) / 255.0
    x = img[None, :, :, None]
    out = np.asarray(engine(x))
    with torch.no_grad():
        ref = model(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_lenet_engine_save_load(lenet_pair, tmp_path, rng):
    model, engine = lenet_pair
    engine.save(str(tmp_path / "eng"))
    from tensorrtx_tpu.core.engine import load_engine

    eng2 = load_engine(str(tmp_path / "eng"))
    x = rng.standard_normal((1, 32, 32, 1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(eng2(x)), atol=1e-6)
