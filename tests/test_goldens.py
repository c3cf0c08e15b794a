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

from tensorrtx_tpu.tools.goldens import (GOLDEN_PATH, assert_matches,
                                         compute_golden)

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
    assert_matches(compute_golden(name), goldens[name], ctx=name)


def _all_names():
    if not os.path.exists(GOLDEN_PATH):
        return FAST
    # "@" keys are variant-matrix digests, checked by test_detector_matrix
    return sorted(k for k in json.load(open(GOLDEN_PATH)) if "@" not in k)


@pytest.mark.fast
@pytest.mark.parametrize("name", FAST)
def test_golden_fast(name):
    _check(name)


@pytest.mark.parametrize("name", [n for n in _all_names() if n not in FAST])
def test_golden_full(name):
    _check(name)
