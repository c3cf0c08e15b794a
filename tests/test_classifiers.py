"""A-pattern classifier parity vs torch references (SURVEY.md §2.2)."""

import numpy as np
import pytest
import torch

from tensorrtx_tpu.core.engine import build_engine
from tensorrtx_tpu.core.wts import state_dict_to_wts
from torch_refs import classifiers_torch as C
from torch_refs.yolo11_torch import randomize


def _roundtrip(tm, name, tmp_path, rng, shape=(224, 224), x_range=1.0, **cfg):
    tm = randomize(tm, seed=11).eval()
    wts = tmp_path / f"{name}.wts"
    state_dict_to_wts(str(wts), tm.state_dict())
    eng = build_engine(name, str(wts), **cfg)
    x = rng.uniform(-x_range, x_range, (2, 3, *shape)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(eng(np.transpose(x, (0, 2, 3, 1))))
    tol = max(2e-3, 3e-6 * float(np.abs(ref).max()))
    np.testing.assert_allclose(got, ref, atol=tol)


def test_alexnet(tmp_path, rng):
    _roundtrip(C.AlexNet(num_classes=10), "alexnet", tmp_path, rng, num_classes=10)


def test_vgg11(tmp_path, rng):
    _roundtrip(C.VGG11(num_classes=10), "vgg", tmp_path, rng, num_classes=10)


def test_squeezenet(tmp_path, rng):
    _roundtrip(C.SqueezeNet11(num_classes=10), "squeezenet", tmp_path, rng,
               num_classes=10)


def test_mobilenetv2(tmp_path, rng):
    _roundtrip(C.MobileNetV2(num_classes=10), "mobilenetv2", tmp_path, rng,
               shape=(96, 96), num_classes=10, input_h=96, input_w=96)
