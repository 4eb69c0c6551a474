"""bench.py measurement-library guards (the driver's headline contract).

bench runs unattended on the single-tenant TPU at round end; its
measurement paths must stay executable on CPU so a regression is caught
here, not after an acquisition."""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402  (repo root on path via the insert above)


def test_measure_compute_chained_matches_unchained_contract():
    """chain=K wraps the full pipeline in a lax.fori_loop; both paths must
    execute and report a positive throughput (the K>1 path is what cancels
    the tunnel's ~8.6 ms/call dispatch floor on TPU — PERF.md r3)."""
    ips1 = bench.measure_compute("yolov3-tiny", 128, 1, 1,
                                 "float32", "default")
    ips2 = bench.measure_compute("yolov3-tiny", 128, 1, 1,
                                 "float32", "default", chain=2)
    assert np.isfinite(ips1) and ips1 > 0
    assert np.isfinite(ips2) and ips2 > 0


def test_chain_rejects_nothing_but_counts_iterations(monkeypatch):
    """The img/s arithmetic must scale with chain: a chain=K call counts
    batch*iters*K images.  Patch the clock to a deterministic ramp and pin
    the formula (guards against a future edit double- or under-counting)."""
    t = iter(float(i) for i in range(1000))
    calls = {"n": 0}

    class _Det:
        params = None

        def _pipeline(self, key):
            def fn(params, x):
                calls["n"] += 1

                class R:  # minimal result pytree stand-in
                    boxes = np.zeros((1, 3, 4), np.float32)
                    valid = np.zeros((1, 3), bool)

                return R()

            return fn

    monkeypatch.setattr(bench, "_load_detector",
                        lambda *a, **kw: (_Det(), "float32"))
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(t))
    # chain=1 path only (the fori_loop path needs real jax arrays).  The
    # patched clock ticks 1s per perf_counter call and measure_compute
    # calls it exactly twice (t0, t1) => dt = 1.0 s, so the reported
    # throughput must be exactly batch*iters images / 1 s.
    ips = bench.measure_compute("yolov3-tiny", 128, 4, 3,
                                "float32", "default")
    assert ips == pytest.approx(4 * 3 / 1.0)
    assert calls["n"] == 4  # 1 warm + 3 timed iterations


def test_bench_cli_emits_one_json_contract_line(tmp_path):
    """Full driver path: `python bench.py` must print exactly one JSON
    object on stdout with the metric/value/unit/vs_baseline keys
    (BENCH_r{N}.json is parsed from it verbatim)."""
    import json
    import os
    import subprocess

    repo = __file__.rsplit("/", 2)[0]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py"),
         "--model", "yolov3-tiny", "--size", "128", "--batch", "1",
         "--iters", "1", "--retries", "0", "--skip-cpu-baseline",
         "--mode", "compute", "--chain", "2"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=540)
    assert proc.returncode == 0, proc.stderr[-800:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    payload = json.loads(lines[0])
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}
    assert payload["unit"] == "images/sec"
    assert payload["value"] > 0
    assert "chained x2 dispatch" in payload["metric"]  # disclosure intact
