"""Shared parent-process scaffolding for the one-acquisition TPU harvests.

Every harvest tool in this directory is a patient PARENT that re-execs a
measurement CHILD (a self-contained ``python -c`` script emitting one JSON
row per step) until the child reaches its ``{"step": "done"}`` sentinel.
The single-tenant landmines (CLAUDE.md) shape everything here:

* ONE process, never probe/kill — a killed client poisons the next grant
  acquisition for many minutes;
* per-attempt watchdog (``--timeout``) bounds PJRT init/compile hangs;
* attempts re-exec a FRESH interpreter (jax caches a failed backend init
  in-process);
* **auto-resume**: before each attempt the parent counts the contiguously
  banked ``step_id`` rows already in the out file and sets
  ``HARVEST_SKIP_TO`` so a retried child skips straight past them (the
  persistent XLA compile cache makes the skipped compiles cheap, but the
  measurements themselves — minutes each — are not re-paid).  An explicit
  ``HARVEST_SKIP_TO`` in the launch environment wins.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

# The canonical CHILD preamble (ADVICE r3: this block was copy-pasted into
# every harvest tool and the copies diverged — tpu_harvest.py shipped without
# the step_id contract and burned a tunnel attempt).  Tools build their
# payload as ``CHILD = harvest_common.CHILD_PRELUDE + r\"\"\"...\"\"\"``: the
# auto-resume contract (guard() rows carry step_id; SKIP_TO honors
# HARVEST_SKIP_TO) now lives in exactly one place.
CHILD_PRELUDE = r"""
import json, os, time
import numpy as np

def emit(**kw):
    print(json.dumps(kw), flush=True)

import bench  # repo-root bench.py: measurement library
bench._honor_jax_platforms_env()
import jax

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

SKIP_TO = int(os.environ.get("HARVEST_SKIP_TO", "0"))  # resume control
t_session = time.perf_counter()
emit(step="devices", devices=str(jax.devices()), backend=jax.default_backend())

def guard(step_id, name, fn):
    # step_id in every row is the auto-resume contract (harvest_common.
    # banked_skip_to counts banked ids from the out file); a row without it
    # makes a watchdog-killed attempt restart at step 1 forever.
    if step_id < SKIP_TO:
        emit(step=name, step_id=step_id, skipped=True)
        return None
    t0 = time.perf_counter()
    try:
        out = fn()
    except Exception as e:
        emit(step=name, step_id=step_id, error=repr(e)[:400])
        return None
    emit(step=name, step_id=step_id,
         seconds=round(time.perf_counter() - t0, 1), result=out)
    return out
"""


def child_step_ids(child_src: str) -> list[int]:
    """The ordered guard() step ids declared in a CHILD payload script.

    Parsed from the source so the parent's resume arithmetic tracks the
    child's REAL step list — ids are unique and ordered (CI-enforced,
    tests/test_tools.py) but not necessarily contiguous (retired steps
    leave gaps, e.g. tpu_harvest.py's step 26)."""
    import ast

    ids = [int(n.args[0].value) for n in ast.walk(ast.parse(child_src))
           if isinstance(n, ast.Call)
           and getattr(n.func, "id", "") == "guard"]
    return ids


def banked_skip_to(out_path: str, step_ids: "list[int] | None" = None) -> int:
    """The resume point: skip every banked step up to the first unbanked one.

    A row counts as banked when it carries a ``result`` (measurement
    landed).  If step 3 errored but step 4 banked, we resume at 3
    (guard() re-runs it) rather than silently skipping a hole; with
    ``step_ids`` (the child's declared guard ids) a *retired* id that no
    longer exists in the child is not treated as a hole."""
    if not os.path.exists(out_path):
        return 0
    banked: set[int] = set()
    with open(out_path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(row, dict) and "result" in row and "step_id" in row:
                banked.add(int(row["step_id"]))
    if step_ids:
        for sid in sorted(step_ids):
            if sid not in banked:
                return sid
        return max(step_ids) + 1
    n = 1
    while n in banked:
        n += 1
    return n


def run_once(child_src: str, args) -> tuple[int, bool]:
    """One child attempt: stream rows to stdout + the out file, watchdogged."""
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    if "HARVEST_SKIP_TO" not in os.environ:
        try:
            ids = child_step_ids(child_src)
        except SyntaxError:
            ids = None
        skip = banked_skip_to(args.out, ids)
        if skip > 1:
            print(f"auto-resume: {skip - 1} step(s) banked in {args.out}, "
                  f"HARVEST_SKIP_TO={skip}", file=sys.stderr)
        env["HARVEST_SKIP_TO"] = str(skip)
    done = False
    with open(args.out, "a") as sink, \
            open(args.out + ".stderr", "a") as err_sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", child_src],
                                stdout=subprocess.PIPE,
                                stderr=err_sink,
                                text=True, env=env, cwd=repo)
        timer = threading.Timer(args.timeout, proc.kill)
        timer.daemon = True
        timer.start()
        try:
            for line in proc.stdout:
                sys.stdout.write(line)
                sys.stdout.flush()
                sink.write(line)
                sink.flush()
                if '"step": "done"' in line:
                    done = True
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
        finally:
            timer.cancel()
    if proc.returncode not in (0,):
        print(f"child exited rc={proc.returncode}", file=sys.stderr)
    return (0 if proc.returncode == 0 else 2), done


def harvest_main(child_src: str, default_out: str,
                 default_retries: int = 5, default_retry_wait: int = 120,
                 default_timeout: int = 2400) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--retries", type=int, default=default_retries)
    ap.add_argument("--retry-wait", type=int, default=default_retry_wait)
    ap.add_argument("--timeout", type=int, default=default_timeout)
    ap.add_argument("--out", default=default_out)
    args = ap.parse_args()

    stop_file = os.environ.get("HARVEST_STOP_FILE", "/tmp/harvest_stop")
    for attempt in range(args.retries + 1):
        if os.path.exists(stop_file):
            # Graceful drain: the driver's round-end bench needs the
            # single-tenant TPU — touch the stop file and the parent quits
            # BETWEEN attempts (never mid-acquisition, which would poison
            # the next grant).
            print(f"stop file {stop_file} present — draining (delete the "
                  "file to re-enable harvest runs)", file=sys.stderr)
            return 3
        if attempt:
            print(f"retry {attempt}/{args.retries} in {args.retry_wait}s",
                  file=sys.stderr)
            time.sleep(args.retry_wait)
        rc, done = run_once(child_src, args)
        if done:
            return 0
        print(f"attempt {attempt + 1} ended rc={rc} without 'done'",
              file=sys.stderr)
    return 1
