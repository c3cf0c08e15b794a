"""Golden-fixture regression net: every registry model's fixed-seed output
digest must match tests/goldens.json (tools/goldens.py — the offline analog
of the reference's tensor-dump parity, ppocrv5/README.md:449-476).

A failure here means a model's numerics changed. If the change is
intentional, regenerate: ``python -m tensorrtx_tpu.tools.goldens <model>``.
"""

import json
import os

import numpy as np
import pytest

from tensorrtx_tpu.tools.goldens import GOLDEN_PATH, compute_golden

# quick models guard the fast CI tier; the rest run in the full suite
FAST = ["lenet", "mlp", "squeezenet", "shufflenetv2", "crnn", "lprnet",
        "superpoint", "mobilenetv2", "resnet", "yolov5-lite"]


def _load():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("tests/goldens.json not generated")
    return json.load(open(GOLDEN_PATH))


def _check(name):
    goldens = _load()
    if name not in goldens:
        pytest.skip(f"no golden recorded for {name}")
    got = compute_golden(name)
    exp = goldens[name]
    assert set(got) == set(exp), (set(got) ^ set(exp))
    for key, g in got.items():
        e = exp[key]
        assert g["shape"] == e["shape"], (name, key, g["shape"], e["shape"])
        scale = max(abs(e["mean"]) + e["std"], 1e-3)
        assert abs(g["mean"] - e["mean"]) < 2e-3 * scale + 1e-5, (name, key)
        assert abs(g["std"] - e["std"]) < 2e-3 * scale + 1e-5, (name, key)
        for a, b in zip(g["sample"], e["sample"]):
            assert abs(a - b) < 5e-3 * scale + 1e-4, (name, key, a, b)


def _all_names():
    if not os.path.exists(GOLDEN_PATH):
        return FAST
    return sorted(json.load(open(GOLDEN_PATH)))


@pytest.mark.fast
@pytest.mark.parametrize("name", FAST)
def test_golden_fast(name):
    _check(name)


@pytest.mark.parametrize("name", [n for n in _all_names() if n not in FAST])
def test_golden_full(name):
    _check(name)
