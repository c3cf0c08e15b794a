"""AOT engine serialization via jax.export (the .engine blob analog)."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from test_lenet import TorchLeNet


def test_export_stablehlo_roundtrip(tmp_path, rng):
    from jax import export as jexport

    torch.manual_seed(0)
    tm = TorchLeNet().eval()
    wts = tmp_path / "l.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine("lenet", str(wts))
    blob = tmp_path / "lenet.hlo"
    eng.export_stablehlo(str(blob), batch=2)
    assert blob.stat().st_size > 1000

    exported = jexport.deserialize(blob.read_bytes())
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    out = exported.call(eng.params, x)
    ref = np.asarray(eng(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)
