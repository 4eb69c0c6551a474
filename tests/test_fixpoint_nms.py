"""Fixpoint NMS equivalence to sequential greedy (exactness proof by
property test — random clustered sets, adversarial suppression chains,
degenerate cases).  The fixpoint formulation (ops/nms.fixpoint_suppress and
the reworked Pallas kernel) is the production path; greedy_suppress stays
as the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_yolo_tpu.ops.nms import (
    fixpoint_suppress,
    greedy_suppress,
    iou_matrix,
)
from tests.test_nms import random_detections


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("thresh", [0.3, 0.45, 0.6])
def test_fixpoint_equals_greedy(seed, thresh):
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
    b = np.asarray(fixpoint_suppress(iou, valid, thresh))
    np.testing.assert_array_equal(a, b)


def _chain_boxes(n: int, overlap: float = 0.6) -> np.ndarray:
    """Rank-ordered boxes where each overlaps ONLY its predecessor — the
    worst case for fixpoint round count (alternating keep/kill chain: box 0
    kept, 1 killed, 2 kept, ...)."""
    w = 10.0
    step = w * (1 - overlap)
    return np.asarray([[i * step, 0.0, i * step + w, w] for i in range(n)],
                      np.float32)


def test_fixpoint_adversarial_chain():
    b = jnp.asarray(_chain_boxes(64))
    valid = jnp.ones((64,), bool)
    iou = iou_matrix(b)
    keep_g = np.asarray(greedy_suppress(iou, valid, 0.3))
    keep_f = np.asarray(fixpoint_suppress(iou, valid, 0.3))
    np.testing.assert_array_equal(keep_g, keep_f)
    # alternating pattern is the known greedy answer for a pure chain
    assert keep_f[0] and not keep_f[1] and keep_f[2]


def test_fixpoint_chain_with_invalid_links():
    # invalid candidates must not block their successors (they start dead)
    b = jnp.asarray(_chain_boxes(32))
    valid = np.ones((32,), bool)
    valid[::3] = False
    valid = jnp.asarray(valid)
    iou = iou_matrix(b)
    np.testing.assert_array_equal(
        np.asarray(greedy_suppress(iou, valid, 0.3)),
        np.asarray(fixpoint_suppress(iou, valid, 0.3)))


def test_fixpoint_all_overlap_keeps_first():
    b = jnp.asarray(np.tile(np.asarray([[0, 0, 10, 10]], np.float32), (20, 1)))
    valid = jnp.ones((20,), bool)
    keep = np.asarray(fixpoint_suppress(iou_matrix(b), valid, 0.5))
    assert keep[0] and not keep[1:].any()


def test_fixpoint_all_invalid_and_disjoint():
    b = jnp.asarray(
        np.asarray([[i * 20.0, 0, i * 20 + 10, 10] for i in range(12)],
                   np.float32))
    iou = iou_matrix(b)
    assert not np.asarray(
        fixpoint_suppress(iou, jnp.zeros((12,), bool), 0.5)).any()
    assert np.asarray(
        fixpoint_suppress(iou, jnp.ones((12,), bool), 0.5)).all()


def test_vmapped_fixpoint_equals_greedy():
    rng = np.random.default_rng(3)
    det = np.stack([random_detections(rng, d=300) for _ in range(4)])
    boxes = jnp.asarray(np.stack(
        [det[..., 0] - det[..., 2] / 2, det[..., 1] - det[..., 3] / 2,
         det[..., 0] + det[..., 2] / 2, det[..., 1] + det[..., 3] / 2], axis=-1))
    valid = jnp.asarray(det[..., 4] > 0.5)
    batched = jax.vmap(
        lambda b, v: fixpoint_suppress(iou_matrix(b), v, 0.45))(boxes, valid)
    for i in range(4):
        solo = greedy_suppress(iou_matrix(boxes[i]), valid[i], 0.45)
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(solo))


def test_pallas_kernel_fixpoint_chain():
    """The reworked Pallas kernel (interpret mode on CPU) on the adversarial
    chain + class-wise masking."""
    from pytorch_yolo_tpu.ops.pallas_kernels import nms_keep_pallas

    b = _chain_boxes(48)
    boxes = jnp.asarray(np.stack([b, b]))
    valid = jnp.ones((2, 48), bool)
    cls = np.zeros((2, 48), np.float32)
    cls[1, ::2] = 1.0  # second image: alternating classes -> no suppression
    keep = np.asarray(nms_keep_pallas(boxes, valid, 0.3,
                                      cls_id=jnp.asarray(cls)))
    iou = iou_matrix(jnp.asarray(b))
    ref0 = np.asarray(greedy_suppress(iou, jnp.ones((48,), bool), 0.3))
    np.testing.assert_array_equal(keep[0], ref0)
    assert keep[1].all()  # neighbors differ in class -> nothing suppressed
