"""Multi-chip serving on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8; the driver's dryrun_multichip is the
same path run out-of-tree). Reference analog: one-engine-per-GPU DP
(tutorials/multi_GPU_processing.md) — here a dp×tp Mesh with GSPMD."""

import dataclasses

import jax
import numpy as np
import pytest

from tensorrtx_tpu.parallel import make_mesh, sharded_serving_step


def _tiny_engine():
    import jax.numpy as jnp

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model

    model = get_model("yolo11")
    cfg = dataclasses.replace(model.default_cfg(), scale="n", input_h=64,
                              input_w=64, max_det=16)
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    return Engine("yolo11", params, cfg, "fp32")


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_sharded_serving_step(dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip("needs the 8-device CPU mesh")
    eng = _tiny_engine()
    mesh = make_mesh(dp * tp, dp=dp, tp=tp)
    step, params = sharded_serving_step(eng, mesh, src_h=96, src_w=96)
    batch = dp * 2
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, 96, 96, 3), np.uint8)
    src_hw = np.tile([[96, 96]], (batch, 1)).astype(np.int32)
    out = step(params, frames, src_hw)
    jax.block_until_ready(out)
    assert out["boxes"].shape[0] == batch

    # the sharded step (s2d fast path) must agree with single-device serving
    from tensorrtx_tpu.core.runner import ServingPipeline

    pipe = ServingPipeline(eng, src_h=96, src_w=96, donate=False)
    ref = pipe(frames, src_hw)
    np.testing.assert_array_equal(np.asarray(out["count"]),
                                  np.asarray(ref["count"]))
    n = int(out["count"][0])
    np.testing.assert_allclose(np.asarray(out["boxes"][0][:n]),
                               np.asarray(ref["boxes"][0][:n]),
                               rtol=1e-4, atol=1e-3)
