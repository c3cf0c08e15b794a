"""EfficientAD anomaly map test: structure + torch parity of the PDN."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model
from tensorrtx_tpu.models.efficient_ad import _pdn_a


def test_pdn_matches_torch(rng):
    class PDN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 256, 4)
            self.conv2 = tnn.Conv2d(256, 512, 4)
            self.conv3 = tnn.Conv2d(512, 512, 1)
            self.conv4 = tnn.Conv2d(512, 512, 3)
            self.conv5 = tnn.Conv2d(512, 384, 4)
            self.conv6 = tnn.Conv2d(384, 384, 1)

        def forward(self, x):
            y = F.avg_pool2d(F.relu(self.conv1(x)), 2, 2)
            y = F.avg_pool2d(F.relu(self.conv2(y)), 2, 2)
            y = F.relu(self.conv3(y))
            y = F.relu(self.conv4(y))
            y = F.relu(self.conv5(y))
            return self.conv6(y)

    torch.manual_seed(7)
    tm = PDN().eval()
    for m in tm.modules():
        if isinstance(m, tnn.Conv2d):
            tnn.init.normal_(m.weight, 0, 0.02)
            tnn.init.normal_(m.bias, 0, 0.02)
    p = {f"c{i}": {"w": jnp.asarray(getattr(tm, f"conv{i}").weight.detach()
                                   .numpy().transpose(2, 3, 1, 0)),
                   "b": jnp.asarray(getattr(tm, f"conv{i}").bias.detach().numpy())}
         for i in range(1, 7)}
    x = rng.uniform(0, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(_pdn_a(p, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), ref, atol=1e-3)


def test_efficient_ad_full_graph(rng):
    model = get_model("efficient_ad")
    cfg = model.default_cfg()
    params = jax.tree.map(jnp.asarray, model.build_params(RandomWeightMap(), cfg))
    x = rng.uniform(0, 1, (1, 256, 256, 3)).astype(np.float32)
    out = jax.jit(lambda p, x: model.apply(p, x, cfg))(params, x)
    assert out.shape == (1, 256, 256, 1)
    assert np.isfinite(np.asarray(out)).all()
