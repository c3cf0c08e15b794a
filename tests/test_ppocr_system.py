"""PP-OCRv5 system pieces: dict convention, det/rec preprocess buckets,
dump parity tool, OCR pipeline smoke with rigged engines."""

import numpy as np

from tensorrtx_tpu.pipelines import ppocr_system as S
from tensorrtx_tpu.tools.dump import compare_dumps, run_dump


def test_rec_dictionary_txt(tmp_path):
    p = tmp_path / "dict.txt"
    p.write_text("a\nb\nc\n", encoding="utf-8")
    d = S.load_rec_dictionary(str(p))
    assert d[:3] == ["a", "b", "c"] and d[-1] == " "


def test_rec_dictionary_yaml(tmp_path):
    p = tmp_path / "inference.yml"
    p.write_text("PostProcess:\n  character_dict:\n  - 'x'\n  - 'y'\n"
                 "  other: 1\n", encoding="utf-8")
    d = S.load_rec_dictionary(str(p))
    assert d[:2] == ["x", "y"] and d[-1] == " "


def test_det_resize_shape_multiple_of_32():
    nh, nw = S.det_resize_shape(1000, 750)
    assert nh % 32 == 0 and nw % 32 == 0
    assert abs(nh - 960) <= 32


def test_rec_width_bucket_bounds():
    assert S.rec_width_bucket(10) == 160
    assert S.rec_width_bucket(500) == 640
    assert S.rec_width_bucket(99999) == 3200


def test_rec_preprocess_normalization():
    crop = np.full((24, 60, 3), 255, np.uint8)
    x = S.rec_preprocess(crop, 160)
    assert x.shape == (1, 48, 160, 3)
    assert abs(x[0, 0, 0, 0] - 1.0) < 1e-5  # 255/127.5 - 1 = 1
    assert x[0, 0, -1, 0] == 0.0  # pad region stays 0 (memset semantics)


def test_ctc_dict_convention():
    """id-1 indexing, blank=0, dedupe (postprocess.cpp:162-186)."""

    class FakeEngine:
        cfg = None

        def __call__(self, x, shape_key=None):
            t = 5
            probs = np.zeros((1, t, 4), np.float32)
            ids = [1, 1, 0, 2, 3]  # → "a" (dedup) then "b", "c"
            for i, c in enumerate(ids):
                probs[0, i, c] = 1.0
            return probs

    rec = S.make_ppocr_rec_fn(FakeEngine(), ["a", "b", "c"])
    text, conf = rec(np.zeros((24, 60, 3), np.uint8))
    assert text == "abc"
    assert conf == 1.0


def test_dump_run_and_compare(tmp_path):
    m1 = run_dump("mlp", str(tmp_path / "a"))
    m2 = run_dump("mlp", str(tmp_path / "b"))
    assert m1["outputs"] == m2["outputs"]  # deterministic
    report = compare_dumps(str(tmp_path / "a"), str(tmp_path / "b"))
    assert report["pass"]
