"""`cli validate` turnkey acceptance harness (VERDICT r4 missing #4).

The reference's acceptance flow is "build, run the bundled digit, the
output should be same" (tutorials/getting_started.md:85-105). Here it's
one command with a committed expected-output fixture; the fixture
tests/expected/lenet_6pgm_seed0.json was generated from the seed-0 torch
LeNet (the stand-in for a real checkpoint — zero-egress environment), so
the whole build→infer→compare path is exercised for real.
"""

import json
import os

import numpy as np
import pytest
import torch

from tensorrtx_tpu.cli import main as cli_main
from tensorrtx_tpu.core.wts import state_dict_to_wts
from tests.test_lenet import TorchLeNet

pytestmark = pytest.mark.fast

PGM = "/root/reference/assets/6.pgm"
FIXTURE = os.path.join(os.path.dirname(__file__), "expected",
                       "lenet_6pgm_seed0.json")


@pytest.fixture(scope="module")
def seed0_wts(tmp_path_factory):
    torch.manual_seed(0)
    m = TorchLeNet().eval()
    p = tmp_path_factory.mktemp("val") / "lenet.wts"
    state_dict_to_wts(str(p), m.state_dict())
    return str(p)


@pytest.mark.skipif(not os.path.exists(PGM), reason="reference asset absent")
def test_validate_pass(seed0_wts, capsys):
    rc = cli_main(["validate", "lenet", "-w", seed0_wts, "--image", PGM,
                   "--expect", FIXTURE])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pass"] and out["errors"] == []


@pytest.mark.skipif(not os.path.exists(PGM), reason="reference asset absent")
def test_validate_fail_on_wrong_expectation(seed0_wts, tmp_path, capsys):
    with open(FIXTURE) as f:
        doc = json.load(f)
    doc["result"]["top5"][0]["class"] = (
        doc["result"]["top5"][0]["class"] + 1) % 10
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps(doc))
    rc = cli_main(["validate", "lenet", "-w", seed0_wts, "--image", PGM,
                   "--expect", str(bad)])
    assert rc == 1
    out = json.loads(capsys.readouterr().out)
    assert not out["pass"] and out["errors"]


def test_validate_detection_comparator():
    """Detection lists compare by best-IoU assignment with class/score
    checks (the int8/bf16 accuracy contract: same detections)."""
    from tensorrtx_tpu.tools.validate import DEFAULT_TOL, _compare

    exp = {"detections": [
        {"box": [10, 10, 50, 50], "score": 0.9, "class": 3}]}
    good = {"detections": [
        {"box": [11, 10, 50, 51], "score": 0.92, "class": 3}]}
    errs = []
    _compare(exp, good, DEFAULT_TOL, errs)
    assert errs == []
    bad = {"detections": [
        {"box": [100, 100, 150, 150], "score": 0.92, "class": 3}]}
    errs = []
    _compare(exp, bad, DEFAULT_TOL, errs)
    assert errs
