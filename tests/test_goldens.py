"""Framework vs committed golden fixtures (torch-free parity pinning).

Goldens are generated once from the independent oracle
(tests/make_goldens.py) and committed; these tests keep future refactors
honest even in environments without torch (SURVEY.md §4.2.1)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    path = os.path.join(GOLDEN_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing — run tests/make_goldens.py")
    return np.load(path)


def test_decode_golden():
    from pytorch_yolo_tpu.ops.decode import decode_head

    g = _load("decode.npz")
    anchors = tuple(map(tuple, g["anchors"]))
    raw_nhwc = g["raw_nchw"].transpose(0, 2, 3, 1)
    ours = np.asarray(decode_head(jnp.asarray(raw_nhwc), anchors,
                                  int(g["stride"]), int(g["classes"])))
    np.testing.assert_allclose(ours, g["decoded"], rtol=1e-5, atol=1e-5)


def test_letterbox_golden():
    from pytorch_yolo_tpu.ops.preprocess import letterbox_image

    g = _load("letterbox.npz")
    ours = np.asarray(letterbox_image(jnp.asarray(g["image"]), size=int(g["size"])))
    np.testing.assert_allclose(ours, g["letterboxed"], rtol=1e-4, atol=1e-4)


def test_nms_golden():
    from pytorch_yolo_tpu.ops.nms import batched_nms
    from tests.test_nms import _result_rows, _sorted_rows

    g = _load("nms.npz")
    res = batched_nms(jnp.asarray(g["detections"][None]),
                      conf_thresh=float(g["conf"]), iou_thresh=float(g["iou"]),
                      max_det=512)
    ours = _sorted_rows(_result_rows(res))
    theirs = _sorted_rows(g["kept_rows"])
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)
