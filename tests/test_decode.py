"""YOLO decode parity vs the oracle predict_transform (SURVEY.md §4.2.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.ops.decode import decode_all, decode_head
from tests.oracle.torch_ref import decode_all_oracle, decode_oracle

ANCHORS = ((81, 82), (135, 169), (344, 319))


@pytest.mark.parametrize("g,stride,classes", [(13, 32, 80), (26, 16, 80), (7, 32, 3)])
def test_decode_head_parity(g, stride, classes):
    rng = np.random.default_rng(g)
    a = len(ANCHORS)
    raw_nhwc = rng.normal(0, 1, size=(2, g, g, a * (5 + classes))).astype(np.float32)
    ours = np.asarray(decode_head(jnp.asarray(raw_nhwc), ANCHORS, stride, classes))
    oracle = decode_oracle(raw_nhwc.transpose(0, 3, 1, 2), ANCHORS, stride, classes)
    assert ours.shape == oracle.shape == (2, g * g * a, 5 + classes)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_decode_box_semantics():
    """Hand-check the decode math at a known cell (SURVEY.md §3.3 equations)."""
    g, stride, classes = 4, 32, 2
    a = len(ANCHORS)
    raw = np.zeros((1, g, g, a * (5 + classes)), dtype=np.float32)
    # cell (row=1, col=2), anchor 1: tx=ty=0 -> sigmoid=0.5
    out = np.asarray(decode_head(jnp.asarray(raw), ANCHORS, stride, classes))
    d = out[0].reshape(g, g, a, 5 + classes)
    np.testing.assert_allclose(d[1, 2, 1, 0], (0.5 + 2) * stride)  # bx uses col
    np.testing.assert_allclose(d[1, 2, 1, 1], (0.5 + 1) * stride)  # by uses row
    np.testing.assert_allclose(d[1, 2, 1, 2], ANCHORS[1][0])  # bw = pw * e^0
    np.testing.assert_allclose(d[1, 2, 1, 3], ANCHORS[1][1])
    np.testing.assert_allclose(d[..., 4], 0.5)  # sigmoid(0)
    np.testing.assert_allclose(d[..., 5:], 0.5)  # independent sigmoids


@pytest.mark.parametrize("name,size,total", [
    ("yolov3-tiny", 416, 2535),
    ("yolov3", 416, 10647),
    ("yolov3", 320, 6300),
])
def test_decode_all_concat(name, size, total):
    spec = model_spec(name)
    rng = np.random.default_rng(0)
    heads = []
    from pytorch_yolo_tpu.models.darknet import head_shapes

    for shape in head_shapes(spec, size):
        heads.append(jnp.asarray(rng.normal(0, 1, size=shape).astype(np.float32)))
    ours = np.asarray(decode_all(tuple(heads), spec, size))
    assert ours.shape == (1, total, 85)
    oracle = decode_all_oracle(
        spec, [np.asarray(h).transpose(0, 3, 1, 2) for h in heads], size)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_decode_rectangular_grid():
    """Gy != Gx (rectangular net input) parity vs oracle."""
    rng = np.random.default_rng(44)
    gy, gx, stride, classes = 8, 13, 32, 80
    raw = rng.normal(0, 1, size=(2, gy, gx, 255)).astype(np.float32)
    ours = np.asarray(decode_head(jnp.asarray(raw), ANCHORS, stride, classes))
    oracle = decode_oracle(raw.transpose(0, 3, 1, 2), ANCHORS, stride, classes)
    assert ours.shape == oracle.shape == (2, gy * gx * 3, 5 + classes)
    np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_region_decode_parity_and_semantics():
    """[region] head: grid-unit anchors scaled by stride, softmax classes."""
    spec = model_spec("yolov2-tiny")
    head = spec.yolo_layers[0]
    rng = np.random.default_rng(5)
    raw = rng.normal(0, 1, size=(2, 13, 13, 425)).astype(np.float32)
    ours = np.asarray(decode_all((jnp.asarray(raw),), spec, 416))
    oracle = decode_all_oracle(spec, [raw.transpose(0, 3, 1, 2)], 416)
    assert ours.shape == oracle.shape == (2, 845, 85)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)
    # softmax: class columns are a distribution
    np.testing.assert_allclose(ours[..., 5:].sum(-1), 1.0, rtol=1e-5)
    # anchor scaling: zero logits -> bw == anchor_w * stride exactly
    zero = np.zeros_like(raw[:1])
    d = np.asarray(decode_all((jnp.asarray(zero),), spec, 416))[0].reshape(13, 13, 5, 85)
    for a_i, (aw, ah) in enumerate(head.anchors):
        np.testing.assert_allclose(d[0, 0, a_i, 2], aw * 32, rtol=1e-6)
        np.testing.assert_allclose(d[0, 0, a_i, 3], ah * 32, rtol=1e-6)


def test_scale_xy_decode_matches_oracle():
    """YOLOv4 grid sensitivity: (a*sigma - (a-1)/2 + c) * stride vs oracle."""
    from pytorch_yolo_tpu.ops.decode import decode_head
    from tests.oracle.torch_ref import decode_oracle

    rng = np.random.default_rng(11)
    anchors = ((23, 27), (37, 58), (81, 82))
    raw = rng.normal(0, 2, size=(2, 9, 9, 255)).astype(np.float32)
    for sxy in (1.0, 1.05, 1.2):
        ours = np.asarray(decode_head(jnp.asarray(raw), anchors, 16, 80,
                                      scale_xy=sxy))
        want = decode_oracle(raw.transpose(0, 3, 1, 2), anchors, 16, 80,
                             scale_xy=sxy)
        np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-5)
    # scale widens the center range beyond the cell: offsets may go negative
    a = 1.2
    lo = np.asarray(decode_head(jnp.asarray(np.full_like(raw, -50.0)),
                                anchors, 16, 80, scale_xy=a))
    assert lo[0, 0, 0] == pytest.approx(-0.5 * (a - 1) * 16, abs=1e-4)


def test_decode_all_uses_head_scale_xy():
    """decode_all threads YoloSpec.scale_x_y (yolov4-tiny heads: 1.05)."""
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.models.darknet import head_shapes
    from pytorch_yolo_tpu.ops.decode import decode_all, decode_head

    spec = model_spec("yolov4-tiny")
    rng = np.random.default_rng(3)
    heads = tuple(jnp.asarray(rng.normal(0, 1, size=s).astype(np.float32))
                  for s in head_shapes(spec, 416))
    got = np.asarray(decode_all(heads, spec, 416))
    h0 = spec.yolo_layers[0]
    manual = np.asarray(decode_head(heads[0], h0.anchors, 32, 80,
                                    scale_xy=1.05))
    np.testing.assert_allclose(got[:, : manual.shape[1]], manual,
                               rtol=1e-6, atol=1e-6)
    # and it is NOT the scale_xy=1.0 decode (guard against silent drops)
    plain = np.asarray(decode_head(heads[0], h0.anchors, 32, 80, scale_xy=1.0))
    assert np.abs(plain[..., :2] - manual[..., :2]).max() > 0.1
