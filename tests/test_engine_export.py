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


def test_save_with_aot_and_load_uses_it(tmp_path):
    """save(export_aot=True) → load attaches the serialized program and
    __call__ runs it without re-tracing (TRT deserializeCudaEngine analog)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from tensorrtx_tpu.core.engine import Engine, load_engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("lenet")
    cfg = model.default_cfg()
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    eng = Engine("lenet", params, cfg, "fp32")
    d = tmp_path / "eng"
    eng.save(str(d), export_aot=True)
    assert (d / "program.stablehlo").exists()

    eng2 = load_engine(str(d))
    assert eng2._aot_path is not None and eng2._aot_batch == 1
    h, w, c = model.input_shape(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, h, w, c)),
                    jnp.float32)
    out_aot = np.asarray(eng2(x))          # batch matches → AOT program
    assert eng2._aot_fn is not None        # proves the AOT path executed
    out_jit = np.asarray(eng2._jitted(eng2.params, x))
    np.testing.assert_allclose(out_aot, out_jit, atol=1e-6)
    # mismatched batch falls back to the jitted path
    x2 = jnp.concatenate([x, x])
    out2 = np.asarray(eng2(x2))
    assert out2.shape[0] == 2


def test_enable_persistent_cache_sets_config(tmp_path):
    import jax

    from tensorrtx_tpu.core.engine import enable_persistent_cache

    d = tmp_path / "xc"
    old = jax.config.jax_compilation_cache_dir
    try:
        enable_persistent_cache(str(d))
        assert jax.config.jax_compilation_cache_dir == str(d)
        assert d.is_dir()
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
