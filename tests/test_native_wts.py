"""Native C++ .wts parser vs the Python one."""

import numpy as np
import pytest

from tensorrtx_tpu.core.wts import _load_wts_python, save_wts


def test_native_parser_matches_python(tmp_path, rng):
    pytest.importorskip("tensorrtx_tpu.native.wts_native")
    from tensorrtx_tpu.native import wts_native

    tensors = {
        "a.weight": rng.standard_normal(1000).astype(np.float32),
        "b.bias": np.array([0.0, -1.5, 3.25e-12, np.inf, -np.inf], np.float32),
        "c": rng.standard_normal(1).astype(np.float32),
    }
    p = tmp_path / "m.wts"
    save_wts(str(p), tensors)
    nat = wts_native.load(str(p))
    ref = _load_wts_python(str(p))
    assert set(nat) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(nat[k], ref[k])


def test_native_parser_speed(tmp_path, rng):
    pytest.importorskip("tensorrtx_tpu.native.wts_native")
    import time

    from tensorrtx_tpu.native import wts_native

    tensors = {f"t{i}": rng.standard_normal(20000).astype(np.float32)
               for i in range(20)}
    p = tmp_path / "big.wts"
    save_wts(str(p), tensors)
    t0 = time.perf_counter()
    wts_native.load(str(p))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _load_wts_python(str(p))
    t_py = time.perf_counter() - t0
    assert t_native < t_py  # the point of the native path
