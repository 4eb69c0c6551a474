"""Letterbox preprocessing tests vs the numpy oracle (SURVEY.md §4.2.3)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.ops.postprocess import unletterbox_boxes
from pytorch_yolo_tpu.ops.preprocess import (
    letterbox_batch,
    letterbox_geometry,
    letterbox_image,
)
from tests.oracle.torch_ref import letterbox_oracle


def test_geometry():
    g = letterbox_geometry(480, 640, 416)
    assert g.scale == 416 / 640
    assert g.new_w == 416 and g.new_h == int(480 * 416 / 640) == 312
    assert g.pad_x == 0 and g.pad_y == (416 - 312) // 2 == 52
    tall = letterbox_geometry(640, 480, 416)
    assert tall.new_h == 416 and tall.pad_y == 0 and tall.pad_x == (416 - tall.new_w) // 2


@pytest.mark.parametrize("h,w", [(480, 640), (640, 480), (416, 416), (123, 457)])
def test_letterbox_matches_oracle(h, w, rng):
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ours = np.asarray(letterbox_image(jnp.asarray(img), size=416))
    oracle = letterbox_oracle(img, 416)
    assert ours.shape == oracle.shape == (416, 416, 3)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)


def test_pad_fill_value(rng):
    img = rng.integers(0, 256, size=(100, 400, 3), dtype=np.uint8)
    out = np.asarray(letterbox_image(jnp.asarray(img), size=416))
    # top rows are pure pad
    np.testing.assert_allclose(out[0], 128.0 / 255.0)
    np.testing.assert_allclose(out[-1], 128.0 / 255.0)


def test_bgr_flip(rng):
    img = np.zeros((64, 64, 3), dtype=np.uint8)
    img[..., 0] = 200  # blue channel in BGR
    out_bgr = np.asarray(letterbox_image(jnp.asarray(img), size=64, bgr=True))
    out_rgb = np.asarray(letterbox_image(jnp.asarray(img), size=64, bgr=False))
    # bgr=True: blue ends up in channel 2 (RGB order)
    assert out_bgr[32, 32, 2] > 0.7 and out_bgr[32, 32, 0] == 0
    assert out_rgb[32, 32, 0] > 0.7 and out_rgb[32, 32, 2] == 0


def test_batch_matches_single(rng):
    imgs = rng.integers(0, 256, size=(4, 240, 320, 3), dtype=np.uint8)
    batch = np.asarray(letterbox_batch(jnp.asarray(imgs), size=416))
    for i in range(4):
        single = np.asarray(letterbox_image(jnp.asarray(imgs[i]), size=416))
        np.testing.assert_allclose(batch[i], single, rtol=1e-6, atol=1e-6)


def test_unletterbox_inverts_letterbox():
    geo = letterbox_geometry(480, 640, 416)
    # a box in original coords -> letterboxed coords -> back
    orig = np.array([[100.0, 50.0, 300.0, 400.0]], dtype=np.float32)
    lb = np.stack([
        orig[:, 0] * geo.scale + geo.pad_x,
        orig[:, 1] * geo.scale + geo.pad_y,
        orig[:, 2] * geo.scale + geo.pad_x,
        orig[:, 3] * geo.scale + geo.pad_y,
    ], axis=-1)
    back = np.asarray(unletterbox_boxes(jnp.asarray(lb), geo))
    np.testing.assert_allclose(back, orig, rtol=1e-5, atol=1e-3)


def test_unletterbox_clamps():
    geo = letterbox_geometry(480, 640, 416)
    wild = jnp.asarray([[-50.0, -50.0, 5000.0, 5000.0]])
    out = np.asarray(unletterbox_boxes(wild, geo))
    assert out[0, 0] >= 0 and out[0, 1] >= 0
    assert out[0, 2] <= 640 and out[0, 3] <= 480


def test_letterbox_cubic_runs(rng):
    img = rng.integers(0, 256, size=(123, 210, 3), dtype=np.uint8)
    out = np.asarray(letterbox_image(jnp.asarray(img), size=416, method="cubic"))
    assert out.shape == (416, 416, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0  # clamped


def test_letterbox_method_changes_pixels(rng):
    img = rng.integers(0, 256, size=(123, 210, 3), dtype=np.uint8)
    lin = np.asarray(letterbox_image(jnp.asarray(img), size=416, method="linear"))
    cub = np.asarray(letterbox_image(jnp.asarray(img), size=416, method="cubic"))
    assert np.abs(lin - cub).max() > 1e-4


def test_cross_path_box_consistency(rng):
    """detect() (device jax.image resize) vs detect_many() (host cv2 resize)
    must agree on the same images within a pinned tolerance — the two
    resamplers implement the same linear letterbox and a user switching
    paths must not see boxes jump (VERDICT r1 weak #5).

    Pins: paired boxes within 2 px, detection-set overlap >= 90%.
    """
    pytest.importorskip("cv2")
    import pytorch_yolo_tpu as pyt

    det = pyt.Detector.load("yolov3-tiny")
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in ((480, 640), (240, 320))]
    for img in imgs:
        a = det.detect(img, size=416, conf=0.5)               # device resize
        b = det.detect_many([img], size=416, conf=0.5)[0]     # cv2 resize
        bu = det.detect_many([img], size=416, conf=0.5, transfer="u8")[0]
        for other in (b, bu):
            assert abs(len(a) - len(other)) <= max(2, int(0.1 * len(a)))
            if len(a) and len(other):
                d = np.abs(other.boxes[:, None, :] - a.boxes[None, :, :])
                nearest = d.max(-1).min(1)
                assert (nearest < 2.0).mean() >= 0.9, nearest
