"""Leader-election NMS equivalence to sequential greedy (exactness proof by
property test over randomized clustered boxes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.ops.nms import (
    greedy_suppress,
    iou_matrix,
    leader_election_suppress,
)
from tests.test_nms import random_detections


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("thresh", [0.3, 0.45, 0.6])
def test_leader_election_equals_greedy(seed, thresh):
    rng = np.random.default_rng(seed)
    det = random_detections(rng, d=400)
    order = np.argsort(-det[:, 4])[:256]
    d = det[order]
    boxes = jnp.asarray(np.stack(
        [d[:, 0] - d[:, 2] / 2, d[:, 1] - d[:, 3] / 2,
         d[:, 0] + d[:, 2] / 2, d[:, 1] + d[:, 3] / 2], axis=1))
    valid = jnp.asarray(d[:, 4] > 0.4)
    iou = iou_matrix(boxes)
    a = np.asarray(greedy_suppress(iou, valid, thresh))
    b = np.asarray(leader_election_suppress(iou, valid, thresh))
    np.testing.assert_array_equal(a, b)


def test_leader_election_all_invalid():
    boxes = jnp.zeros((16, 4))
    valid = jnp.zeros((16,), bool)
    assert not np.asarray(
        leader_election_suppress(iou_matrix(boxes), valid, 0.5)).any()


def test_leader_election_no_overlaps_keeps_all():
    # disjoint boxes: every valid candidate kept
    b = np.asarray([[i * 20.0, 0, i * 20 + 10, 10] for i in range(12)], np.float32)
    valid = jnp.ones((12,), bool)
    keep = np.asarray(leader_election_suppress(iou_matrix(jnp.asarray(b)), valid, 0.5))
    assert keep.all()


def test_vmapped_leader_election():
    rng = np.random.default_rng(3)
    det = np.stack([random_detections(rng, d=300) for _ in range(3)])
    boxes = jnp.asarray(np.stack(
        [det[..., 0] - det[..., 2] / 2, det[..., 1] - det[..., 3] / 2,
         det[..., 0] + det[..., 2] / 2, det[..., 1] + det[..., 3] / 2], axis=-1))
    valid = jnp.asarray(det[..., 4] > 0.5)
    batched = jax.vmap(
        lambda b, v: leader_election_suppress(iou_matrix(b), v, 0.45))(boxes, valid)
    for i in range(3):
        solo = greedy_suppress(iou_matrix(boxes[i]), valid[i], 0.45)
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(solo))
