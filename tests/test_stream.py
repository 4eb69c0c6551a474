"""detect_stream pipelining: order, completeness, parity with one-shot."""

import numpy as np
import pytest

import pytorch_yolo_tpu as pyt


@pytest.fixture(scope="module")
def det():
    return pyt.Detector.load("yolov3-tiny")


def _imgs(n, seed=0, h=240, w=320):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("n", [0, 1, 2, 5])
def test_stream_counts(det, n):
    out = list(det.detect_stream(iter(_imgs(n)), size=320, conf=0.5))
    assert len(out) == n


def test_stream_matches_oneshot(det):
    imgs = _imgs(4, seed=3)
    streamed = list(det.detect_stream(iter(imgs), size=320, conf=0.5))
    for img, s in zip(imgs, streamed):
        solo = det.detect(img, size=320, conf=0.5)
        assert len(solo) == len(s)
        np.testing.assert_allclose(solo.boxes, s.boxes, rtol=1e-5, atol=1e-3)


def test_stream_mixed_shapes(det):
    imgs = _imgs(2, h=240, w=320) + _imgs(2, h=320, w=240)
    out = list(det.detect_stream(iter(imgs), size=320, conf=0.5))
    assert len(out) == 4
