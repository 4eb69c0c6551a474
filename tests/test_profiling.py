"""PipelineStats / StageStats behavior (SURVEY.md §5.5 observability)."""

import time

from pytorch_yolo_tpu.utils.profiling import PipelineStats, StageStats


def test_stage_stats_summary():
    s = StageStats("x")
    assert s.summary() == {"count": 0}
    for ms in (1, 2, 3):
        s.add(ms / 1e3)
    m = s.summary()
    assert m["count"] == 3
    assert abs(m["mean_ms"] - 2.0) < 1e-6
    assert m["min_ms"] <= m["p50_ms"] <= m["p95_ms"] <= m["max_ms"]


def test_pipeline_stats_throughput_and_report():
    p = PipelineStats()
    assert p.throughput() == 0.0
    p.start()
    with p.stage("detect"):
        time.sleep(0.01)
    p.count(5)
    assert p.throughput() > 0
    rep = p.report()
    assert "items: 5" in rep and "detect" in rep


def test_pipeline_stats_nested_stages():
    p = PipelineStats()
    p.start()
    for _ in range(3):
        with p.stage("a"):
            pass
        with p.stage("b"):
            pass
    assert p.stages["a"].summary()["count"] == 3
    assert p.stages["b"].summary()["count"] == 3


def test_stage_cut_points_structure():
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.utils.profiling import stage_cut_points

    spec = model_spec("yolov3-tiny")
    cuts = stage_cut_points(spec)
    idxs = [i for i, _ in cuts]
    assert idxs == sorted(idxs) and len(set(idxs)) == len(idxs)
    assert idxs[-1] == len(spec.layers) - 1  # ends at the last layer
    assert any("head" in n for _, n in cuts)
    # yolov2's reorg counts as a stride change
    v2 = stage_cut_points(model_spec("yolov2"))
    assert any(i == 26 for i, _ in v2)  # cut right before the reorg at 27


def test_profile_stages_runs():
    import pytorch_yolo_tpu as pyt
    from pytorch_yolo_tpu.utils.profiling import profile_stages

    det = pyt.Detector.load("yolov3-tiny")
    rows = profile_stages(det, size=320, batch=1, iters=1)
    assert len(rows) >= 5
    assert all(r["cum_ms"] > 0 for r in rows)
    # deltas telescope to the final cumulative (each rounded to 1e-3 ms)
    assert abs(sum(r["delta_ms"] for r in rows) - rows[-1]["cum_ms"]) < 1e-2


def test_profile_pipeline_runs():
    import pytorch_yolo_tpu as pyt
    from pytorch_yolo_tpu.utils.profiling import profile_pipeline

    det = pyt.Detector.load("yolov3-tiny")
    rows = profile_pipeline(det, size=320, batch=1, iters=1)
    assert [r["stage"] for r in rows] == ["letterbox", "+forward", "+decode", "+nms"]
    assert all(r["cum_ms"] > 0 and r["img_per_s"] > 0 for r in rows)
    # the forward prefix strictly includes the letterbox prefix's work
    assert rows[1]["cum_ms"] > rows[0]["cum_ms"]
