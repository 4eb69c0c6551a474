"""Guard tests for the ops tooling under tools/.

The harvest/bisect tools embed child-process source as strings (so each
attempt runs in a fresh interpreter — the axon-tunnel survival pattern);
a syntax error there would otherwise only surface on TPU hardware,
mid-round, after an acquisition."""

import ast
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _embedded_source(path: str, var: str) -> str:
    tree = ast.parse(open(os.path.join(REPO, path)).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and getattr(node.targets[0], "id", "") == var:
            if isinstance(node.value, ast.Constant):
                return node.value.value
            # CHILD = CHILD_PRELUDE + r"""...""" (the shared-prelude form,
            # ADVICE r3): import the tool module to resolve the concat.
            import importlib.util

            sys.path.insert(0, os.path.join(REPO, "tools"))
            spec = importlib.util.spec_from_file_location(
                "_tool_under_test", os.path.join(REPO, path))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            return getattr(mod, var)
    raise AssertionError(f"{var} not found in {path}")


def test_every_harvest_child_parses():
    """All tpu_harvest*.py children: syntax + the SKIP_TO resume contract
    (guard() step ids unique and ordered)."""
    import glob

    paths = sorted(glob.glob(os.path.join(REPO, "tools", "tpu_harvest*.py")))
    assert len(paths) >= 5
    for path in paths:
        rel = os.path.relpath(path, REPO)
        src = _embedded_source(rel, "CHILD")
        ast.parse(src)  # syntax
        ids = [int(n.args[0].value) for n in ast.walk(ast.parse(src))
               if isinstance(n, ast.Call) and getattr(n.func, "id", "") == "guard"]
        assert ids == sorted(ids), f"{rel}: step ids must be ordered"
        assert len(ids) == len(set(ids)), f"{rel}: step ids must be unique"


def test_bisect_probe_parses():
    ast.parse(_embedded_source("tools/bisect_compile_hang.py", "PROBE_SRC"))


def test_prove_pallas_child_parses():
    ast.parse(_embedded_source("tools/prove_pallas_tpu.py", "CHILD"))


def test_bisect_harness_runs_one_probe_cpu():
    """End-to-end harness mechanics on CPU (tiny model, forward probe)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = os.path.join(REPO, ".pytest_bisect_smoke.jsonl")
    if os.path.exists(out):
        os.remove(out)
    try:
        proc = subprocess.run(
            [sys.executable, "tools/bisect_compile_hang.py",
             "--model", "yolov3-tiny", "--timeout", "600", "--settle", "0",
             "--probes", "forward", "--out", out],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
        assert proc.returncode == 0, proc.stderr[-500:]
        rows = [json.loads(l) for l in open(out)]
        assert rows and rows[-1]["ok"] and rows[-1]["probe"] == "forward"
    finally:
        if os.path.exists(out):
            os.remove(out)
