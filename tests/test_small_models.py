"""SuperPoint, CSRNet, UFLD, TSM parity/behavior tests."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tensorrtx_tpu.models.tsm import temporal_shift
from torch_refs.yolo11_torch import randomize


def test_temporal_shift_matches_reference(rng):
    """Replicates tsm/test_shift.py: compare against the MIT torch impl."""
    n, t, c, h, w = 2, 8, 16, 5, 6
    x = rng.normal(0, 1, (n * t, c, h, w)).astype(np.float32)

    # MIT TSM reference (shift op)
    xt = torch.from_numpy(x).view(n, t, c, h, w)
    fold = c // 8
    out = torch.zeros_like(xt)
    out[:, :-1, :fold] = xt[:, 1:, :fold]
    out[:, 1:, fold:2 * fold] = xt[:, :-1, fold:2 * fold]
    out[:, :, 2 * fold:] = xt[:, :, 2 * fold:]
    exp = out.view(n * t, c, h, w).numpy()

    got = np.asarray(temporal_shift(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), num_segments=t))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), exp, atol=1e-6)


class TorchSuperPoint(tnn.Module):
    def __init__(self):
        super().__init__()
        c = tnn.Conv2d
        self.conv1a, self.conv1b = c(1, 64, 3, padding=1), c(64, 64, 3, padding=1)
        self.conv2a, self.conv2b = c(64, 64, 3, padding=1), c(64, 64, 3, padding=1)
        self.conv3a, self.conv3b = c(64, 128, 3, padding=1), c(128, 128, 3, padding=1)
        self.conv4a, self.conv4b = c(128, 128, 3, padding=1), c(128, 128, 3, padding=1)
        self.convPa, self.convPb = c(128, 256, 3, padding=1), c(256, 65, 1)
        self.convDa, self.convDb = c(128, 256, 3, padding=1), c(256, 256, 1)

    def forward(self, x):
        r = F.relu
        x = r(self.conv1b(r(self.conv1a(x))))
        x = F.max_pool2d(x, 2, 2)
        x = r(self.conv2b(r(self.conv2a(x))))
        x = F.max_pool2d(x, 2, 2)
        x = r(self.conv3b(r(self.conv3a(x))))
        x = F.max_pool2d(x, 2, 2)
        x = r(self.conv4b(r(self.conv4a(x))))
        return self.convPb(r(self.convPa(x))), self.convDb(r(self.convDa(x)))


def test_superpoint_parity(tmp_path, rng):
    tm = randomize(TorchSuperPoint(), seed=51).eval()
    wts = tmp_path / "sp.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("superpoint", str(wts))
    x = rng.uniform(0, 1, (1, 1, 120, 160)).astype(np.float32)
    with torch.no_grad():
        semi, desc = tm(torch.from_numpy(x))
    out = eng(np.transpose(x, (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out["semi"]),
                               semi.numpy().transpose(0, 2, 3, 1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["desc"]),
                               desc.numpy().transpose(0, 2, 3, 1), atol=1e-3)


def test_csrnet_runs_and_dilation(rng):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    import dataclasses
    import jax

    model = get_model("csrnet")
    cfg = dataclasses.replace(model.default_cfg(), input_h=64, input_w=64)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 8, 8, 1)  # /8 spatial, 1ch density


def test_ufld_head_and_postprocess(rng):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.models.ufld import postprocess
    import dataclasses
    import jax

    model = get_model("ufld")
    cfg = dataclasses.replace(model.default_cfg(), input_h=96, input_w=160,
                              griding=20, rows=8, lanes=2)
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 96, 160, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 21, 8, 2)
    loc = postprocess(out, cfg)
    assert loc.shape == (1, 8, 2)
    assert (loc >= 0).all() and (loc <= 20).all()
