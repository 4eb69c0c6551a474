"""Fixed-shape, class-wise non-maximum suppression.

Replaces the reference's ``write_results`` / ``non_max_suppression``
(SURVEY.md §2.1 #6, §3.2): there, a confidence mask, a ``unique(classes)``
device->host sync, and a per-class Python loop with dynamic shapes.  None of
that compiles on TPU.  The TPU-native design is fully static:

  1. score/class reduction over the (N, D, 5+C) decoded tensor;
  2. ``lax.top_k`` selects a fixed K candidates per image by masked score
     (invalid = -1, so they sort last);
  3. center->corner conversion + a (K, K) IoU matrix **masked by class
     equality** (iou := iou * [cls_i == cls_j]) — one pass performs
     class-wise NMS with no per-class loop (SURVEY.md §7 hard parts);
  4. greedy suppression with fixed shapes: the **parallel fixpoint**
     (:func:`fixpoint_suppress` / the Pallas kernel) — provably the same
     keep-set as sequential greedy, rounds = suppression-chain depth
     (typically 2-5).  :func:`greedy_suppress` (sequential K-step oracle)
     and :func:`leader_election_suppress` (one round per kept box) are
     retained as property-test oracles.

Output is a fixed (N, K, 7) tensor [x1, y1, x2, y2, obj, cls_score, cls_id]
(reference row format, SURVEY.md §1 L4) plus a validity mask; downstream code
and the API layer trim on host after one final D2H copy.

``score_mode`` controls the ranking/filter score:
  * ``"obj"``     — objectness only (reference family default; sort key and
                    confidence filter both use sigma(to)).
  * ``"obj*cls"`` — objectness times best-class probability.
Pinned as "obj" by default; re-verify against the real reference when the
mount is populated (SURVEY.md re-verification checklist #2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Class-wise suppression is done by masking the IoU matrix with a
# class-equality mask (iou := iou * [cls_i == cls_j]) rather than the
# family-common "offset coordinates by cls*BIG" trick: the offset breaks when
# decoded boxes exceed the stride (exp(tw) overflow on garbage inputs) and
# costs fp32 precision at large offsets.  The mask is exact for any box.


class NMSResult(NamedTuple):
    """Fixed-shape NMS output for a batch.

    boxes:  (N, K, 4) x1,y1,x2,y2 in net-input pixels (letterboxed frame)
    obj:    (N, K) objectness
    cls_score: (N, K) best-class probability
    cls_id: (N, K) int32 class index
    valid:  (N, K) bool — True for rows that survived filter + NMS
    """

    boxes: jnp.ndarray
    obj: jnp.ndarray
    cls_score: jnp.ndarray
    cls_id: jnp.ndarray
    valid: jnp.ndarray


def iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (K, 4) corner boxes -> (K, K)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def leader_election_suppress(
    iou: jnp.ndarray, valid: jnp.ndarray, iou_thresh: float
) -> jnp.ndarray:
    """Greedy NMS via leader election — identical keep-set to
    :func:`greedy_suppress`, but the loop runs once per *kept* box (early-
    exiting ``while_loop``) instead of once per candidate.

    Each round keeps the highest-ranked undecided candidate (nothing ranked
    above it can still suppress it — that is exactly the next greedy keep)
    and eliminates every candidate it overlaps.  Candidates must be sorted
    by descending score, which both callers guarantee (``lax.top_k``
    output); strict ordering uses the position index."""
    k = iou.shape[0]
    over = jnp.where(iou > iou_thresh, 1.0, 0.0)
    pos_rank = jnp.arange(k, 0, -1, dtype=jnp.float32)
    rank = jnp.where(valid, pos_rank, 0.0)

    def cond(carry):
        _, undecided = carry
        return jnp.max(jnp.where(undecided > 0, rank, 0.0)) > 0.0

    def body(carry):
        keep, undecided = carry
        sel = jnp.where(undecided > 0, rank, 0.0)
        m = jnp.max(sel)
        lead = jnp.where(sel >= m, 1.0, 0.0) * undecided
        ov = lead @ over  # leader's overlap row
        return keep + lead, undecided * (1.0 - jnp.minimum(ov, 1.0)) * (1.0 - lead)

    keep, _ = lax.while_loop(
        cond, body,
        (jnp.zeros((k,), jnp.float32), jnp.where(valid, 1.0, 0.0)))
    return keep > 0.5


def fixpoint_suppress(
    iou: jnp.ndarray, valid: jnp.ndarray, iou_thresh: float
) -> jnp.ndarray:
    """Greedy NMS as a parallel fixpoint — identical keep-set to
    :func:`greedy_suppress`, rounds = longest suppression *chain*, not #kept.

    Greedy NMS has a closed-form recursive characterization: a candidate is
    KEPT iff every higher-ranked overlapping candidate is KILLED, and KILLED
    iff some higher-ranked KEPT candidate overlaps it.  Iterating that rule
    over undecided candidates decides, each round, at least the highest-
    ranked undecided one (all its predecessors are decided), and in practice
    a whole "layer" of the dependency DAG at once: rounds = depth of the
    kept/killed alternation chain (2-5 on real box sets), vs one round per
    kept box for leader election (up to K when most candidates survive).
    Each round is two masked (K,) x (K, K) reductions — same per-round cost
    as leader election's one, so the win is the round count."""
    k = iou.shape[0]
    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # over[j, i]: strictly higher-ranked j overlaps i (candidates are sorted
    # by descending score, so rank order == position order)
    over = (iou > iou_thresh) & (row < col)

    def cond(carry):
        kept, killed = carry
        return jnp.any(~(kept | killed))

    def body(carry):
        kept, killed = carry
        undecided = ~(kept | killed)
        # some higher-ranked not-yet-killed candidate overlaps i -> i cannot
        # be kept this round (if that candidate is KEPT, i dies instead)
        blocked = jnp.any(over & ~killed[:, None], axis=0)
        kill_now = jnp.any(over & kept[:, None], axis=0)
        return (kept | (undecided & ~blocked),
                killed | (undecided & kill_now))

    kept, _ = lax.while_loop(cond, body,
                             (jnp.zeros((k,), bool), ~valid))
    return kept


def greedy_suppress(iou: jnp.ndarray, valid: jnp.ndarray, iou_thresh: float) -> jnp.ndarray:
    """Sequential greedy NMS over score-sorted candidates.

    ``iou`` is (K, K) for candidates already sorted by descending score;
    ``valid[i]`` marks rows that passed the confidence filter.  Returns the
    keep mask: row i survives iff it is valid and no higher-ranked kept row
    overlaps it above ``iou_thresh`` — exactly the reference's greedy
    keep-set (SURVEY.md §3.2)."""
    k = iou.shape[0]
    over = iou > iou_thresh

    def body(i, keep):
        # suppressed if any kept j < i overlaps i
        mask_lt = lax.broadcasted_iota(jnp.int32, (k,), 0) < i
        suppressed = jnp.any(over[i] & keep & mask_lt)
        return keep.at[i].set(valid[i] & ~suppressed)

    return lax.fori_loop(0, k, body, jnp.zeros((k,), dtype=bool))


def _select_topk(det: jnp.ndarray, conf_thresh: float, max_det: int, score_mode: str):
    """Per-image candidate selection from (D, 5+C) decoded rows."""
    obj = det[:, 4]
    cls_prob = det[:, 5:]
    cls_score = jnp.max(cls_prob, axis=-1)
    cls_id = jnp.argmax(cls_prob, axis=-1).astype(jnp.int32)
    rank = obj if score_mode == "obj" else obj * cls_score
    passed = obj > conf_thresh
    masked = jnp.where(passed, rank, -1.0)
    k = min(max_det, det.shape[0])  # static: D is the trace-time row count
    top_scores, idx = lax.top_k(masked, k)
    sel = det[idx]
    return sel, obj[idx], cls_score[idx], cls_id[idx], top_scores > 0.0


def _nms_single(
    det: jnp.ndarray,
    conf_thresh: float,
    iou_thresh: float,
    max_det: int,
    score_mode: str,
    class_agnostic: bool,
) -> NMSResult:
    sel, obj, cls_score, cls_id, valid = _select_topk(det, conf_thresh, max_det, score_mode)
    # center/size -> corners (reference write_results conversion)
    cx, cy, w, h = sel[:, 0], sel[:, 1], sel[:, 2], sel[:, 3]
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
    iou = iou_matrix(boxes)
    if not class_agnostic:
        iou = iou * (cls_id[:, None] == cls_id[None, :])
    keep = fixpoint_suppress(iou, valid, iou_thresh)
    return NMSResult(boxes=boxes, obj=obj, cls_score=cls_score, cls_id=cls_id, valid=keep)


def batched_nms_fused(
    rows: jnp.ndarray,
    conf_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    max_det: int = 300,
    class_agnostic: bool = False,
    use_pallas: bool | None = None,
) -> NMSResult:
    """NMS over fused decode+score rows (N, D, 8) from
    :func:`pytorch_yolo_tpu.ops.pallas_kernels.decode_score_all`.

    Columns: x1, y1, x2, y2, obj, cls_score, cls_id, rank.  Selection and
    suppression semantics are identical to :func:`batched_nms`; the input is
    simply pre-reduced (no 85-column tensor, no center->corner step), and the
    greedy suppression can run as a Pallas VMEM kernel on TPU."""
    n, d, _ = rows.shape
    k = min(max_det, d)

    obj = rows[..., 4]
    rank = rows[..., 7]
    masked = jnp.where(obj > conf_thresh, rank, -1.0)
    top_rank, idx = lax.top_k(masked, k)  # (N, K)
    sel = jnp.take_along_axis(rows, idx[..., None], axis=1)  # (N, K, 8)
    valid = top_rank > 0.0

    boxes = sel[..., 0:4]
    cls_f = sel[..., 6]
    cls_id = cls_f.astype(jnp.int32)

    from .pallas_kernels import nms_keep_pallas, _on_tpu

    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        keep = nms_keep_pallas(boxes, valid, iou_thresh,
                               cls_id=None if class_agnostic else cls_f)
    else:
        def suppress(b, v, c):
            iou = iou_matrix(b)
            if not class_agnostic:
                iou = iou * (jnp.abs(c[:, None] - c[None, :]) < 0.5)
            return fixpoint_suppress(iou, v, iou_thresh)

        keep = jax.vmap(suppress)(boxes, valid, cls_f)
    return NMSResult(boxes=boxes, obj=sel[..., 4], cls_score=sel[..., 5],
                     cls_id=cls_id, valid=keep)


@functools.partial(
    jax.jit, static_argnames=("conf_thresh", "iou_thresh", "max_det", "score_mode", "class_agnostic")
)
def batched_nms(
    detections: jnp.ndarray,
    conf_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    max_det: int = 300,
    score_mode: str = "obj",
    class_agnostic: bool = False,
) -> NMSResult:
    """Class-wise NMS over a batch of decoded detections (N, D, 5+C).

    Defaults mirror the reference CLI (confidence 0.5, nms_thresh 0.4,
    SURVEY.md §5.6)."""
    fn = functools.partial(
        _nms_single,
        conf_thresh=conf_thresh,
        iou_thresh=iou_thresh,
        max_det=max_det,
        score_mode=score_mode,
        class_agnostic=class_agnostic,
    )
    return jax.vmap(fn)(detections)
