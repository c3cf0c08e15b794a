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


def test_spatial_sharded_apply_matches_single_device():
    """sp: one image row-sharded across 8 chips; GSPMD halo exchange must
    reproduce the single-device result exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from jax.sharding import Mesh

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.parallel import spatial_sharded_apply

    model = get_model("unet")
    cfg = dataclasses.replace(model.default_cfg(), input_h=64, input_w=96)
    params = model.build_params(RandomWeightMap(seed=1), cfg)
    eng = Engine("unet", params, cfg, "fp32")
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    step, sp_params = spatial_sharded_apply(eng, mesh)

    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (1, 64, 96, 3)).astype(np.float32)
    got = np.asarray(step(sp_params, x))
    ref = np.asarray(eng(x))
    # sharded convs accumulate across halo boundaries in a different
    # order; f32 agreement to ~1e-4 relative
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=2e-3)


def test_engine_pipeline_matches_serial():
    """pp: stages on disjoint device groups, overlapped by async dispatch;
    results must equal running the stages serially on one device."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    import jax.numpy as jnp

    from tensorrtx_tpu.parallel import EnginePipeline, split_devices

    w1 = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (16, 32)),
                     jnp.float32)
    w2 = jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (32, 8)),
                     jnp.float32)
    s1 = jax.jit(lambda x: jnp.tanh(x @ w1))
    s2 = jax.jit(lambda x: jax.nn.softmax(x @ w2, axis=-1))
    groups = split_devices(2)
    pipe = EnginePipeline([(s1, groups[0]), (s2, groups[1])])
    batches = [np.random.default_rng(i).normal(0, 1, (4, 16))
               .astype(np.float32) for i in range(5)]
    outs = pipe.run(batches, to_host=np.asarray)
    for x, o in zip(batches, outs):
        ref = np.asarray(s2(s1(jnp.asarray(x))))
        np.testing.assert_allclose(o, ref, atol=1e-6)


def test_gpipe_matches_sequential():
    """GPipe microbatch pipelining of a block stack over an 8-stage pp
    axis must reproduce the sequential forward exactly."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tensorrtx_tpu.parallel.gpipe import gpipe_apply, shard_stage_params

    S, D = 8, 16
    rng = np.random.default_rng(3)
    params = {
        "w": jnp.asarray(rng.normal(0, 0.3, (S, D, D)), jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, (S, D)), jnp.float32),
    }

    def stage(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    mesh = Mesh(np.array(jax.devices()[:S]), ("pp",))
    fn = gpipe_apply(stage, mesh)
    sp = shard_stage_params(params, mesh)
    xs = jnp.asarray(rng.normal(0, 1, (6, 4, D)), jnp.float32)  # 6 microbatches
    got = np.asarray(fn(sp, xs))

    ref = np.asarray(xs)
    for s in range(S):
        ref = np.tanh(ref @ np.asarray(params["w"][s])
                      + np.asarray(params["b"][s]))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gpipe_vit_encoder_matches_sequential():
    """A real model through the pipeline: an 8-block ViT encoder, one
    block per pp stage, must match the sequential loop."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.models.vit import block_a
    from tensorrtx_tpu.parallel.gpipe import gpipe_apply, shard_stage_params

    model = get_model("vit")
    cfg = dataclasses.replace(model.default_cfg(), layers=8, hidden=64,
                              heads=4, mlp=128, input_h=32, input_w=32,
                              patch=16, num_classes=10)
    params = model.build_params(RandomWeightMap(seed=4), cfg)
    blocks = params["blocks"]
    stacked = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)

    rng = np.random.default_rng(5)
    xs = jnp.asarray(rng.normal(0, 1, (4, 2, 5, 64)), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:8]), ("pp",))
    fn = gpipe_apply(lambda p, x: block_a(p, x, cfg.heads), mesh)
    got = np.asarray(fn(shard_stage_params(stacked, mesh), xs))

    ref = xs.reshape(8, 5, 64)
    for blk in blocks:
        ref = block_a(blk, ref, cfg.heads)
    np.testing.assert_allclose(got, np.asarray(ref).reshape(4, 2, 5, 64),
                               rtol=2e-4, atol=2e-4)


def test_gpipe_hetero_conv_backbone_matches_sequential():
    """Heterogeneous-stage pipelining: a 4-stage conv backbone whose
    activation shape changes at every boundary (stride-2 stages) must
    reproduce the sequential forward (VERDICT r2 #5 — per-boundary buffer
    shapes; stage weights live one-per-device as flattened rows)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the multi-device CPU mesh")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tensorrtx_tpu.ops import nn as jnn
    from tensorrtx_tpu.parallel.gpipe import gpipe_apply_hetero

    rng = np.random.default_rng(7)
    chans = [8, 16, 32, 64, 96]
    mb = 2
    in_shapes = [(mb, 32 // (2 ** s), 32 // (2 ** s), chans[s])
                 for s in range(4)]
    out_shape = (mb, 2, 2, chans[4])
    stage_params = [{
        "w": jnp.asarray(rng.normal(0, 0.2, (3, 3, chans[s], chans[s + 1])),
                         jnp.float32),
        "b": jnp.asarray(rng.normal(0, 0.1, (chans[s + 1],)), jnp.float32),
    } for s in range(4)]

    def stage(p, x):
        import jax as _jax
        return _jax.nn.relu(jnn.conv2d(x, p["w"], p["b"], stride=2,
                                       padding=1))

    mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
    fn, packed = gpipe_apply_hetero(
        [stage] * 4, stage_params, in_shapes, out_shape, mesh)
    xs = jnp.asarray(rng.normal(0, 1, (5,) + in_shapes[0]), jnp.float32)
    got = np.asarray(fn(packed, xs))

    ref = []
    for m in range(5):
        y = xs[m]
        for p in stage_params:
            y = stage(p, y)
        ref.append(np.asarray(y))
    np.testing.assert_allclose(got, np.stack(ref), rtol=1e-5, atol=1e-5)


def test_mesh_serving_pipeline_and_report(tmp_path):
    """The `cli run --dp/--tp` surface: MeshServingPipeline must agree with
    single-device detect_images, and the sharding report must expose the
    sharded-vs-replicated param fraction."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    from tensorrtx_tpu.core.runner import ServingPipeline
    from tensorrtx_tpu.parallel import MeshServingPipeline, make_mesh

    eng = _tiny_engine()
    mesh = make_mesh(4, dp=2, tp=2)
    pipe = MeshServingPipeline(eng, mesh, src_h=96, src_w=96)
    rep = pipe.report
    assert rep["tp"] == 2 and 0.0 < rep["frac_bytes_sharded"] <= 1.0
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (80, 96, 3), np.uint8) for _ in range(3)]
    got = pipe.detect_images(imgs)          # 3 images pad to dp multiple 4
    ref = ServingPipeline(eng, src_h=96, src_w=96,
                          donate=False).detect_images(imgs)
    assert len(got) == 3
    for g, r in zip(got, ref):
        assert g["boxes"].shape == r["boxes"].shape
        np.testing.assert_allclose(g["scores"], r["scores"],
                                   rtol=1e-4, atol=1e-4)


def test_gpipe_serving_step_vit():
    """The `cli run --pp` surface: pipelined ViT forward == plain apply."""
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tensorrtx_tpu.core.engine import Engine
    from tensorrtx_tpu.core.random_weights import RandomWeightMap
    from tensorrtx_tpu.core.registry import get_model
    from tensorrtx_tpu.parallel import gpipe_serving_step

    model = get_model("vit")
    cfg = dataclasses.replace(model.default_cfg(), input_h=64, input_w=64,
                              layers=4, hidden=64, heads=4, mlp=128)
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    eng = Engine("vit", params, cfg, "fp32")
    mesh = Mesh(np.array(jax.devices()[:4]), ("pp",))
    step = gpipe_serving_step(eng, mesh)
    x = np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)).astype(
        np.float32)
    got = np.asarray(step(x))
    ref = np.asarray(eng(x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
