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
