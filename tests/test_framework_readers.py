"""MXNet .params and TF checkpoint-V2 native readers (numpy-only).

Reference analogs: arcface/gen_wts.py (MXNet model.get_params() → .wts) and
psenet/gen_tf_wts.py (pywrap_tensorflow.NewCheckpointReader → .wts). These
tests roundtrip synthetic fixtures through the binary formats and then feed
the converted .wts to the real model builders end-to-end.
"""

import numpy as np
import pytest

from tensorrtx_tpu.core.wts import load_wts
from tensorrtx_tpu.tools.gen_wts import convert, extract_tensors
from tensorrtx_tpu.tools.mxnet_reader import (read_mxnet_params,
                                              write_mxnet_params)
from tensorrtx_tpu.tools.tf_reader import (read_tf_checkpoint,
                                           write_tf_checkpoint)


@pytest.mark.fast
def test_mxnet_roundtrip(tmp_path, rng):
    tensors = {
        "arg:conv0_weight": rng.normal(0, 1, (8, 3, 3, 3)).astype(np.float32),
        "arg:bn0_gamma": rng.normal(0, 1, (8,)).astype(np.float32),
        "aux:bn0_moving_mean": rng.normal(0, 1, (8,)).astype(np.float32),
        "arg:fc1_weight": rng.normal(0, 1, (4, 8)).astype(np.float32),
        "arg:scalar_bias": np.float32(3.25).reshape(()),
    }
    path = tmp_path / "model-0000.params"
    write_mxnet_params(str(path), tensors)
    got = read_mxnet_params(str(path))
    assert set(got) == {"conv0_weight", "bn0_gamma", "bn0_moving_mean",
                        "fc1_weight", "scalar_bias"}
    np.testing.assert_array_equal(got["conv0_weight"],
                                  tensors["arg:conv0_weight"])
    np.testing.assert_array_equal(got["scalar_bias"],
                                  tensors["arg:scalar_bias"])
    # gen-wts auto-detects .params
    out = tmp_path / "m.wts"
    n = convert(str(path), str(out))
    assert n == 5
    wm = load_wts(str(out))
    np.testing.assert_allclose(
        wm["fc1_weight"].reshape(4, 8), tensors["arg:fc1_weight"], rtol=1e-6)


@pytest.mark.fast
def test_tf_checkpoint_roundtrip(tmp_path, rng):
    tensors = {
        "resnet_v1_50/conv1/weights":
            rng.normal(0, 1, (7, 7, 3, 64)).astype(np.float32),
        "resnet_v1_50/conv1/BatchNorm/gamma":
            rng.normal(0, 1, (64,)).astype(np.float32),
        "feature_results/Conv_1/biases":
            rng.normal(0, 1, (6,)).astype(np.float32),
        "global_step": np.int64(1234).reshape(()),
    }
    prefix = str(tmp_path / "model.ckpt")
    write_tf_checkpoint(prefix, tensors)
    got = read_tf_checkpoint(prefix)
    assert set(got) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], np.asarray(tensors[k]))
        assert got[k].shape == np.asarray(tensors[k]).shape
    # accepts the .index path and the containing dir too
    assert set(read_tf_checkpoint(prefix + ".index")) == set(tensors)
    assert set(read_tf_checkpoint(str(tmp_path))) == set(tensors)
    # gen-wts --format tf (auto-detected from the .index sibling)
    out = tmp_path / "m.wts"
    n = convert(prefix, str(out))
    assert n == 4
    wm = load_wts(str(out))
    np.testing.assert_allclose(
        wm["resnet_v1_50/conv1/weights"].reshape(7, 7, 3, 64),
        tensors["resnet_v1_50/conv1/weights"], rtol=1e-6)


def _collect_random_params(name):
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    md = get_model(name)
    wm = RandomWeightMap(seed=2)
    params = md.build_params(wm, md.default_cfg())
    return md, dict(wm.raw), params


def test_mxnet_to_arcface_engine(tmp_path):
    """Full chain: .params fixture → gen-wts → arcface build_params."""
    import jax

    from tensorrtx_tpu.core.params import WeightMap

    md, raw, ref_params = _collect_random_params("arcface-mobilefacenet")
    fixture = {("aux:" + k if ("moving_" in k or "_gamma" in k) else
                "arg:" + k): v for k, v in raw.items()}
    path = tmp_path / "arcface.params"
    write_mxnet_params(str(path), fixture)
    out = tmp_path / "arcface.wts"
    convert(str(path), str(out), fmt="mxnet")
    params2 = md.build_params(WeightMap(load_wts(str(out))), md.default_cfg())
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_tf_to_psenet_engine(tmp_path):
    """Full chain: TF ckpt fixture → gen-wts → psenet build_params."""
    import jax

    from tensorrtx_tpu.core.params import WeightMap

    md, raw, ref_params = _collect_random_params("psenet")
    prefix = str(tmp_path / "psenet.ckpt")
    write_tf_checkpoint(prefix, raw)
    out = tmp_path / "psenet.wts"
    convert(prefix, str(out), fmt="tf")
    params2 = md.build_params(WeightMap(load_wts(str(out))), md.default_cfg())
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
