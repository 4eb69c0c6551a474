"""mAP evaluator tests with handcrafted cases (SURVEY.md §4.2)."""

import numpy as np
import pytest

from pytorch_yolo_tpu.eval import ImageEval, average_precision, evaluate, evaluate_coco


def _img(dets, gts):
    """dets: list of (box, score, cls); gts: list of (box, cls)."""
    db = np.asarray([d[0] for d in dets], np.float64).reshape(-1, 4)
    ds = np.asarray([d[1] for d in dets], np.float64)
    dc = np.asarray([d[2] for d in dets], np.int64)
    gb = np.asarray([g[0] for g in gts], np.float64).reshape(-1, 4)
    gc = np.asarray([g[1] for g in gts], np.int64)
    return ImageEval(db, ds, dc, gb, gc)


BOX = [0, 0, 10, 10]
BOX_SHIFT = [20, 20, 30, 30]


def test_perfect_detection():
    im = _img([(BOX, 0.9, 0)], [(BOX, 0)])
    r = evaluate([im])
    assert r["mAP"] == 1.0


def test_miss_and_false_positive():
    # one GT, one detection that misses entirely
    im = _img([(BOX_SHIFT, 0.9, 0)], [(BOX, 0)])
    assert evaluate([im])["mAP"] == 0.0


def test_duplicate_detection_counts_fp():
    # two detections on one GT: second is a FP -> AP = 1.0 precision at
    # recall 1 reached at first det; continuous AP stays 1.0
    im = _img([(BOX, 0.9, 0), (BOX, 0.8, 0)], [(BOX, 0)])
    r = evaluate([im])
    assert r["mAP"] == 1.0
    # but if the duplicate outranks a miss on another GT it costs precision
    im2 = _img([(BOX, 0.95, 0), (BOX, 0.9, 0), (BOX_SHIFT, 0.8, 0)],
               [(BOX, 0), (BOX_SHIFT, 0)])
    r2 = evaluate([im2])
    assert 0.5 < r2["mAP"] < 1.0


def test_class_confusion_is_fp():
    im = _img([(BOX, 0.9, 1)], [(BOX, 0)])
    r = evaluate([im])
    assert r["per_class"][0] == 0.0  # GT class 0 never matched


def test_half_recall():
    im = _img([(BOX, 0.9, 0)], [(BOX, 0), (BOX_SHIFT, 0)])
    r = evaluate([im])
    assert r["mAP"] == pytest.approx(0.5)


def test_iou_threshold_sensitivity():
    # detection overlaps GT with IoU 0.7 (70/100): TP at 0.5, FP at 0.75
    det_box = [0, 0, 10, 7]
    im = _img([(det_box, 0.9, 0)], [(BOX, 0)])
    assert evaluate([im], iou_thresh=0.5)["mAP"] == 1.0
    assert evaluate([im], iou_thresh=0.75)["mAP"] == 0.0


def test_average_precision_known_curve():
    # 3 dets: TP, FP, TP over 2 GT
    tp = np.array([1, 0, 1.0])
    fp = np.array([0, 1, 0.0])
    # recall:    .5, .5, 1.0 ; precision: 1, .5, 2/3 ; interp: 1, 2/3, 2/3
    # continuous AP = .5*1 + .5*(2/3) = 5/6
    assert average_precision(tp, fp, 2) == pytest.approx(5 / 6)
    c101 = average_precision(tp, fp, 2, method="coco101")
    assert 0.80 <= c101 <= 0.86


def test_evaluate_coco_structure():
    im = _img([(BOX, 0.9, 0)], [(BOX, 0)])
    r = evaluate_coco([im])
    assert r["AP50"] == 1.0 and r["AP"] == 1.0
    assert len(r["per_threshold"]) == 10


def test_best_unmatched_gt_preferred():
    # Detection A argmax-overlaps GT1 (already taken by a higher-score det)
    # but also clears the threshold on unmatched GT2 — pycocotools matches
    # the best *unmatched* GT, so both detections are TPs.
    gt1 = [0, 0, 10, 10]
    gt2 = [4, 0, 14, 10]           # overlaps gt1
    det1 = gt1                      # score .9 -> takes gt1 exactly
    det2 = [1, 0, 11, 10]           # argmax IoU is gt1, but gt2 IoU ~ 0.5
    im = _img([(det1, 0.9, 0), (det2, 0.8, 0)], [(gt1, 0), (gt2, 0)])
    r = evaluate([im], iou_thresh=0.4)
    assert r["mAP"] == 1.0


def test_crowd_gt_is_ignore_region():
    crowd_box = [0, 0, 100, 100]
    # detection entirely inside the crowd region, no non-crowd GT of class 0
    im = ImageEval(
        det_boxes=np.asarray([[10, 10, 20, 20]], np.float64),
        det_scores=np.asarray([0.9]),
        det_classes=np.asarray([0]),
        gt_boxes=np.asarray([crowd_box, BOX_SHIFT], np.float64),
        gt_classes=np.asarray([0, 0]),
        gt_crowd=np.asarray([True, False]),
    )
    r = evaluate([im])
    # the crowd-matched det is neither TP nor FP; the non-crowd GT is missed
    assert r["per_class"][0] == 0.0
    # add a det on the real GT: AP must be 1.0 (crowd det didn't become a FP
    # ranked above it)
    im2 = ImageEval(
        det_boxes=np.asarray([[10, 10, 20, 20], BOX_SHIFT], np.float64),
        det_scores=np.asarray([0.95, 0.9]),
        det_classes=np.asarray([0, 0]),
        gt_boxes=np.asarray([crowd_box, BOX_SHIFT], np.float64),
        gt_classes=np.asarray([0, 0]),
        gt_crowd=np.asarray([True, False]),
    )
    assert evaluate([im2])["per_class"][0] == 1.0
    # crowd GTs don't count toward recall's denominator
    assert evaluate([im2])["mAP"] == 1.0


def test_crowd_uses_intersection_over_det_area():
    # small det fully inside a huge crowd box: IoU tiny, IoF = 1.0 -> ignored
    im = ImageEval(
        det_boxes=np.asarray([[40, 40, 42, 42]], np.float64),
        det_scores=np.asarray([0.9]),
        det_classes=np.asarray([0]),
        gt_boxes=np.asarray([[0, 0, 1000, 1000]], np.float64),
        gt_classes=np.asarray([0]),
        gt_crowd=np.asarray([True]),
    )
    r = evaluate([im])
    # only GT is crowd -> class has no countable GT -> excluded (nan)
    assert 0 not in r["per_class"]


def test_multi_image_aggregation():
    ims = [
        _img([(BOX, 0.9, 0)], [(BOX, 0)]),
        _img([(BOX, 0.8, 0)], [(BOX_SHIFT, 0)]),  # miss + fp
    ]
    r = evaluate(ims)
    # 2 dets sorted: tp, fp over 2 gts -> recall .5, precision 1 then .5
    assert r["mAP"] == pytest.approx(0.5)
