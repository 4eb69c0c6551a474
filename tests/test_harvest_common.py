"""Parent-side harvest scaffolding (tools/harvest_common.py).

These tools run unattended against the single-tenant TPU for hours; the
auto-resume arithmetic and the embedded child scripts must be correct
BEFORE they burn an acquisition."""

import pathlib
import sys

TOOLS = pathlib.Path(__file__).resolve().parents[1] / "tools"
sys.path.insert(0, str(TOOLS))

from harvest_common import banked_skip_to  # noqa: E402


def _write(tmp_path, lines):
    p = tmp_path / "out.jsonl"
    p.write_text("".join(line + "\n" for line in lines))
    return str(p)


def test_skip_to_missing_and_empty(tmp_path):
    assert banked_skip_to(str(tmp_path / "nope.jsonl")) == 0
    assert banked_skip_to(_write(tmp_path, [])) == 1


def test_skip_to_contiguous_banked_rows(tmp_path):
    out = _write(tmp_path, [
        '{"step": "devices", "devices": "[TPU]"}',
        '{"step": "a", "step_id": 1, "seconds": 3.0, "result": 1.5}',
        '{"step": "b", "step_id": 2, "seconds": 9.0, "result": {"x": 1}}',
    ])
    assert banked_skip_to(out) == 3


def test_skip_to_stops_at_hole(tmp_path):
    # step 2 errored (no "result") but 3 banked: resume at the hole, not
    # past it — guard() must re-run the failed step.
    out = _write(tmp_path, [
        '{"step": "a", "step_id": 1, "result": 1.0}',
        '{"step": "b", "step_id": 2, "error": "UNAVAILABLE"}',
        '{"step": "c", "step_id": 3, "result": 2.0}',
        'not json at all',
    ])
    assert banked_skip_to(out) == 2


def test_skip_to_ignores_skipped_markers(tmp_path):
    # a resumed child re-emits {"skipped": true} rows — they are not
    # measurements and must not advance the resume point on their own.
    out = _write(tmp_path, [
        '{"step": "a", "step_id": 1, "skipped": true}',
        '{"step": "b", "step_id": 2, "result": 7.0}',
    ])
    assert banked_skip_to(out) == 1


def test_stop_file_drains_before_any_attempt(tmp_path, monkeypatch, capsys):
    """HARVEST_STOP_FILE present => parent exits rc=3 without spawning a
    child (the round-end-bench drain path; must never kill mid-attempt)."""
    from harvest_common import harvest_main

    stop = tmp_path / "stop"
    stop.write_text("")
    monkeypatch.setenv("HARVEST_STOP_FILE", str(stop))
    out = tmp_path / "rows.jsonl"
    monkeypatch.setattr(sys, "argv", ["x", "--out", str(out), "--retries", "2"])
    rc = harvest_main("raise SystemExit(99)  # must never run", str(out))
    assert rc == 3
    assert not out.exists() or out.read_text() == ""


def test_skip_to_with_declared_ids_tolerates_retired_gaps(tmp_path):
    """tpu_harvest.py retired step 26 (ids jump 25 -> 27): with the child's
    declared id list, a fully-banked file resumes past the end instead of
    stalling at the permanent gap and re-running hours of banked steps."""
    from harvest_common import banked_skip_to, child_step_ids

    out = _write(tmp_path, [
        '{"step": "a", "step_id": 1, "result": 1.0}',
        '{"step": "b", "step_id": 2, "result": 1.0}',
        '{"step": "d", "step_id": 4, "result": 1.0}',
    ])
    ids = [1, 2, 4]            # 3 retired
    assert banked_skip_to(out, ids) == 5        # all banked => skip all
    assert banked_skip_to(out, [1, 2, 4, 6]) == 6  # 6 unbanked => run it
    # declared ids parse straight from a CHILD payload
    src = "guard(1, 'a', f)\nguard(2, 'b', f)\nguard(4, 'd', f)\n"
    assert child_step_ids(src) == [1, 2, 4]
