"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU).

SURVEY.md §4.2.3: every kernel keeps a jnp reference implementation as its
oracle — these tests pin the Pallas implementations to them element-for-
element, and the fused NMS path to the plain batched path."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.models.darknet import head_shapes
from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.ops.nms import batched_nms, batched_nms_fused, greedy_suppress, iou_matrix
from pytorch_yolo_tpu.ops.pallas_kernels import (
    decode_score_all,
    decode_score_head,
    decode_score_head_ref,
    nms_keep_pallas,
)
from tests.test_nms import _result_rows, _sorted_rows, random_detections

ANCHORS = ((81, 82), (135, 169), (344, 319))


@pytest.mark.parametrize("g,stride", [(13, 32), (26, 16), (52, 8)])
def test_decode_score_kernel_matches_ref(g, stride):
    rng = np.random.default_rng(g)
    raw = rng.normal(0, 1, size=(2, g, g, 255)).astype(np.float32)
    ours = np.asarray(decode_score_head(jnp.asarray(raw), ANCHORS, stride, 80))
    ref = np.asarray(decode_score_head_ref(jnp.asarray(raw), ANCHORS, stride, 80))
    assert ours.shape == ref.shape == (2, g * g * 3, 8)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_decode_score_all_both_paths():
    spec = model_spec("yolov3-tiny")
    rng = np.random.default_rng(0)
    heads = tuple(jnp.asarray(rng.normal(0, 1, size=s).astype(np.float32))
                  for s in head_shapes(spec, 416))
    a = np.asarray(decode_score_all(heads, spec, 416, use_pallas=True))
    b = np.asarray(decode_score_all(heads, spec, 416, use_pallas=False))
    assert a.shape == (1, 2535, 8)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_nms_kernel_matches_greedy(seed):
    rng = np.random.default_rng(seed)
    k = 96
    b = rng.uniform(0, 400, size=(3, k, 4)).astype(np.float32)
    boxes = np.concatenate(
        [np.minimum(b[..., :2], b[..., 2:]), np.maximum(b[..., :2], b[..., 2:])], axis=-1)
    valid = rng.uniform(size=(3, k)) > 0.15
    ours = np.asarray(nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.35))
    import jax

    ref = np.asarray(jax.vmap(
        lambda bb, vv: greedy_suppress(iou_matrix(bb), vv, 0.35)
    )(jnp.asarray(boxes), jnp.asarray(valid)))
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("seed,conf,iou", [(0, 0.5, 0.4), (1, 0.3, 0.5), (2, 0.7, 0.45)])
def test_fused_nms_path_matches_plain(seed, conf, iou):
    """decode_score_all + batched_nms_fused == decode_all + batched_nms."""
    rng = np.random.default_rng(seed)
    det = random_detections(rng, d=600)

    plain = batched_nms(jnp.asarray(det[None]), conf_thresh=conf,
                        iou_thresh=iou, max_det=512)

    # build fused rows from the same decoded tensor
    obj = det[:, 4]
    cls_prob = det[:, 5:]
    cls_score = cls_prob.max(axis=1)
    cls_id = cls_prob.argmax(axis=1).astype(np.float32)
    boxes = np.stack([det[:, 0] - det[:, 2] / 2, det[:, 1] - det[:, 3] / 2,
                      det[:, 0] + det[:, 2] / 2, det[:, 1] + det[:, 3] / 2], axis=1)
    rows = np.concatenate(
        [boxes, obj[:, None], cls_score[:, None], cls_id[:, None], obj[:, None]],
        axis=1).astype(np.float32)
    fused = batched_nms_fused(jnp.asarray(rows[None]), conf_thresh=conf,
                              iou_thresh=iou, max_det=512, use_pallas=True)

    a = _sorted_rows(_result_rows(plain))
    b = _sorted_rows(_result_rows(fused))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)


def test_decode_score_class_tie_breaks_to_first():
    """Equal class logits: both paths must pick the lowest class index."""
    g, stride, classes = 4, 32, 6
    raw = np.zeros((1, g, g, 3 * (5 + classes)), dtype=np.float32)
    # all class logits equal (0.0) -> argmax == 0 everywhere
    ours = np.asarray(decode_score_head(jnp.asarray(raw), ANCHORS, stride, classes))
    ref = np.asarray(decode_score_head_ref(jnp.asarray(raw), ANCHORS, stride, classes))
    assert (ours[..., 6] == 0).all()
    np.testing.assert_array_equal(ours[..., 6], ref[..., 6])
    # two-way tie at a higher pair (set in every anchor's channel block)
    for a in range(3):
        base = a * (5 + classes)
        raw[..., base + 5 + 2] = 3.0
        raw[..., base + 5 + 4] = 3.0
    ours = np.asarray(decode_score_head(jnp.asarray(raw), ANCHORS, stride, classes))
    ref = np.asarray(decode_score_head_ref(jnp.asarray(raw), ANCHORS, stride, classes))
    assert (ours[..., 6] == 2).all()
    np.testing.assert_array_equal(ours[..., 6], ref[..., 6])


def test_decode_score_rectangular_grid():
    rng = np.random.default_rng(45)
    raw = rng.normal(0, 1, size=(1, 8, 13, 255)).astype(np.float32)
    ours = np.asarray(decode_score_head(jnp.asarray(raw), ANCHORS, 32, 80))
    ref = np.asarray(decode_score_head_ref(jnp.asarray(raw), ANCHORS, 32, 80))
    assert ours.shape == (1, 8 * 13 * 3, 8)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_decode_score_region_kernel_matches_ref():
    """Softmax cls_act path ([region]) in the Pallas kernel == jnp ref."""
    from pytorch_yolo_tpu.config import head_strides
    from pytorch_yolo_tpu.ops.decode import head_decode_args

    spec = model_spec("yolov2-tiny")
    head, stride = spec.yolo_layers[0], head_strides(spec)[0]
    anchors, cls_act, _, _ = head_decode_args(head, stride)
    assert cls_act == "softmax" and anchors[0] == (0.57273 * 32, 0.677385 * 32)
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.normal(0, 2, size=(2, 13, 13, 425)).astype(np.float32))
    ours = np.asarray(decode_score_head(raw, anchors, stride, 80, cls_act=cls_act))
    ref = np.asarray(decode_score_head_ref(raw, anchors, stride, 80, cls_act=cls_act))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    assert (ours[..., 6] == ref[..., 6]).all()  # argmax ids identical
    # region decode through decode_score_all (model-level dispatch)
    both = [np.asarray(decode_score_all((raw,), spec, 416, use_pallas=p))
            for p in (True, False)]
    np.testing.assert_allclose(both[0], both[1], rtol=1e-5, atol=1e-6)


def test_decode_score_scale_xy_kernel_matches_ref():
    """scale_x_y threads through the fused Pallas decode (interpret mode)."""
    rng = np.random.default_rng(21)
    raw = jnp.asarray(rng.normal(0, 2, size=(2, 13, 13, 255)).astype(np.float32))
    for sxy in (1.05, 1.2):
        ours = np.asarray(decode_score_head(raw, ANCHORS, 32, 80, scale_xy=sxy))
        ref = np.asarray(decode_score_head_ref(raw, ANCHORS, 32, 80, scale_xy=sxy))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # differs from the unscaled decode in the box columns only
    base = np.asarray(decode_score_head_ref(raw, ANCHORS, 32, 80))
    scaled = np.asarray(decode_score_head_ref(raw, ANCHORS, 32, 80, scale_xy=1.2))
    assert np.abs(base[..., :4] - scaled[..., :4]).max() > 0.05
    np.testing.assert_array_equal(base[..., 4:], scaled[..., 4:])
