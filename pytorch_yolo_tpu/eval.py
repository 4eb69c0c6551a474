"""Detection-quality evaluation: PASCAL/COCO-style mAP.

The driver's accuracy metric is mAP@0.5 parity on COCO val (BASELINE.json:2).
The reference repo itself ships no evaluator (SURVEY.md §4.1) — this module
provides one so the parity claim is measurable as soon as weights/data assets
are available: greedy IoU matching per class (highest-score detections first,
each ground truth matched at most once) and AP as the area under the
interpolated precision-recall curve, both the continuous VOC-2010+ integral
and COCO's 101-point variant, plus mAP@[.5:.95].

Pure numpy, host-side — evaluation is offline bookkeeping, not a TPU kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Mapping, Sequence

import numpy as np


@dataclasses.dataclass
class ImageEval:
    """Detections + ground truth for one image.

    det_boxes: (M, 4) xyxy; det_scores: (M,); det_classes: (M,) int
    gt_boxes: (G, 4) xyxy; gt_classes: (G,) int
    """

    det_boxes: np.ndarray
    det_scores: np.ndarray
    det_classes: np.ndarray
    gt_boxes: np.ndarray
    gt_classes: np.ndarray


def _iou_one_to_many(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    if boxes.size == 0:
        return np.zeros((0,), dtype=np.float64)
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a = np.clip(box[2] - box[0], 0, None) * np.clip(box[3] - box[1], 0, None)
    b = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    union = a + b - inter
    return np.where(union > 0, inter / union, 0.0)


def _match_class(
    dets: list[tuple[float, int, np.ndarray]],
    gts: dict[int, np.ndarray],
    iou_thresh: float,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Greedy matching for one class across the dataset.

    dets: (score, image_id, box) list; gts: image_id -> (G, 4).
    Returns (tp, fp) flags in descending-score order and total GT count."""
    n_gt = sum(len(g) for g in gts.values())
    dets = sorted(dets, key=lambda t: -t[0])
    matched: dict[int, np.ndarray] = {i: np.zeros(len(g), bool) for i, g in gts.items()}
    tp = np.zeros(len(dets))
    fp = np.zeros(len(dets))
    for d, (score, img, box) in enumerate(dets):
        g = gts.get(img)
        if g is None or len(g) == 0:
            fp[d] = 1
            continue
        ious = _iou_one_to_many(box, g)
        j = int(np.argmax(ious))
        if ious[j] >= iou_thresh and not matched[img][j]:
            matched[img][j] = True
            tp[d] = 1
        else:
            fp[d] = 1
    return tp, fp, n_gt


def average_precision(tp: np.ndarray, fp: np.ndarray, n_gt: int,
                      method: str = "continuous") -> float:
    """AP from per-detection TP/FP flags (descending score order).

    ``continuous``: exact area under the interpolated PR curve (VOC 2010+).
    ``coco101``: COCO's 101-point average."""
    if n_gt == 0:
        return float("nan")
    if len(tp) == 0:
        return 0.0
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    # interpolated precision: running max from the right
    p_interp = np.maximum.accumulate(precision[::-1])[::-1]
    if method == "coco101":
        grid = np.linspace(0, 1, 101)
        idx = np.searchsorted(recall, grid, side="left")
        p = np.where(idx < len(p_interp), p_interp[np.minimum(idx, len(p_interp) - 1)], 0.0)
        return float(p.mean())
    # continuous integral over recall
    r = np.concatenate([[0.0], recall])
    p = np.concatenate([[p_interp[0]], p_interp])
    return float(np.sum((r[1:] - r[:-1]) * p[1:]))


def evaluate(
    images: Iterable[ImageEval],
    iou_thresh: float = 0.5,
    method: str = "continuous",
) -> dict:
    """mAP at one IoU threshold.  Returns {"mAP", "per_class": {cls: AP}}."""
    by_class_dets: dict[int, list] = {}
    by_class_gts: dict[int, dict[int, np.ndarray]] = {}
    for img_id, im in enumerate(images):
        for c in np.unique(im.gt_classes).tolist() if im.gt_classes.size else []:
            by_class_gts.setdefault(int(c), {})[img_id] = im.gt_boxes[im.gt_classes == c]
        for b, s, c in zip(im.det_boxes, im.det_scores, im.det_classes):
            by_class_dets.setdefault(int(c), []).append((float(s), img_id, np.asarray(b)))

    per_class: dict[int, float] = {}
    for c in sorted(set(by_class_gts) | set(by_class_dets)):
        tp, fp, n_gt = _match_class(
            by_class_dets.get(c, []), by_class_gts.get(c, {}), iou_thresh)
        ap = average_precision(tp, fp, n_gt, method=method)
        if not np.isnan(ap):
            per_class[c] = ap
    m = float(np.mean(list(per_class.values()))) if per_class else 0.0
    return {"mAP": m, "per_class": per_class, "iou_thresh": iou_thresh}


def evaluate_coco(images: Sequence[ImageEval]) -> dict:
    """COCO headline numbers: AP@[.5:.95] (101-point), AP50, AP75."""
    thresholds = np.arange(0.5, 1.0, 0.05)
    aps = [evaluate(images, iou_thresh=float(t), method="coco101")["mAP"]
           for t in thresholds]
    return {
        "AP": float(np.mean(aps)),
        "AP50": aps[0],
        "AP75": aps[5],
        "per_threshold": dict(zip([round(float(t), 2) for t in thresholds], aps)),
    }
