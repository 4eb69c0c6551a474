"""Attribute the int8s b64 pipeline's 46.6 ms against kernel-level rates.

The int8 kernel probe (perf/int8_probe_r3.jsonl) showed XLA's int8 convs
reach 78% of peak at b64 on deep shapes and ~60% on 52-sq shapes — rates
that predict ~27 ms/b64 for yolov3, yet the pipeline measures 46.6 ms.
This child closes that gap with real attribution:

  1. pipeline split letterbox/forward/decode/NMS at b64 (int8s + bf16);
  2. per-resolution-stage prefix profile of the quantized forward
     (stage_cut_points boundaries, one truncated compile per cut) for
     int8s and bf16 at b64 — which stages actually speed up under int8
     and which carry the unexplained time.

  python tools/int8_stage_profile_r3.py [--timeout 2700]
  PROFILE_SKIP_TO=n resumes; PROFILE_CPU_SMOKE=1 JAX_PLATFORMS=cpu runs a
  tiny-model smoke that never touches the TPU.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

CHILD = r"""
import json, os, time
import numpy as np

def emit(**kw):
    print(json.dumps(kw), flush=True)

import bench
bench._honor_jax_platforms_env()
import jax

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

SKIP_TO = int(os.environ.get("PROFILE_SKIP_TO", "0"))
SMOKE = os.environ.get("PROFILE_CPU_SMOKE", "") == "1"
MODEL = "yolov3-tiny" if SMOKE else "yolov3"
B = 2 if SMOKE else 64
ITERS = 2 if SMOKE else 5
t_session = time.perf_counter()
emit(step="devices", devices=str(jax.devices()), backend=jax.default_backend())

def guard(step_id, name, fn):
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

rng = np.random.default_rng(0)

def load(dtype_token):
    det, label = bench._load_detector(MODEL, dtype_token, "default", rng)
    return det

from pytorch_yolo_tpu.utils.profiling import (profile_pipeline,
                                              profile_stages,
                                              stage_cut_points)

def pipeline_split(dtype_token):
    det = load(dtype_token)
    rows = profile_pipeline(det, size=416, batch=B, iters=ITERS)
    for r in rows:
        emit(step="pipeline_split", dtype=dtype_token, **r)
    return rows

def stage_profile(dtype_token):
    det = load(dtype_token)
    cuts = stage_cut_points(det.spec)
    rows = []
    for cut in cuts:  # one call per cut: each banked row survives a timeout
        row = profile_stages(det, size=416, batch=B, iters=ITERS,
                             cuts=[cut])[0]
        prev = rows[-1]["cum_ms"] if rows else 0.0
        row["delta_ms"] = round(row["cum_ms"] - prev, 3)
        emit(step="stage_cut", dtype=dtype_token, **row)
        rows.append(row)
    return rows

guard(1, "pipeline_split_int8s", lambda: pipeline_split("int8s"))
guard(2, "stage_profile_int8s", lambda: stage_profile("int8s"))
guard(3, "pipeline_split_bf16", lambda: pipeline_split("bfloat16"))
guard(4, "stage_profile_bf16", lambda: stage_profile("bfloat16"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=2700)
    ap.add_argument("--out", default="/root/repo/perf/int8_stage_profile_r3.jsonl")
    args = ap.parse_args()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    done = False
    with open(args.out, "a") as sink, \
            open(args.out + ".stderr", "a") as err_sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", CHILD],
                                stdout=subprocess.PIPE, stderr=err_sink,
                                text=True, env=env, cwd=repo)
        import threading

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
    return 0 if done else 1


if __name__ == "__main__":
    raise SystemExit(main())
