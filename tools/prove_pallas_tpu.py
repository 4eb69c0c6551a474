"""Prove the Pallas kernels compiled + executed on real TPU (VERDICT r1 #2).

Runs, in ONE child process (minimizing single-tenant grant cycles), with the
parent surviving any child hang:

  1. decode_score_head compiled (interpret=False) on a tiny head, parity vs
     the jnp reference, then timed on the full yolov3@416 head set.
  2. nms_keep_pallas compiled on K=300, keep-set parity vs the jnp oracle,
     then timed.
  3. Fused (use_pallas=True) vs unfused e2e pipeline throughput.

The child prints one JSON line per completed step (line-buffered), so if a
later step wedges the Mosaic compiler the earlier evidence is already on
disk.  Usage:

  python tools/prove_pallas_tpu.py [--timeout 900] [--out /tmp/pallas_proof.jsonl]

Parent exit codes: 0 all steps done, 2 child died/was killed, 3 timeout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
import numpy as np

def emit(**kw):
    print(json.dumps(kw), flush=True)

import jax
if os.environ.get("JAX_PLATFORMS"):  # sitecustomize forces axon otherwise
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
# CPU smoke mode: interpret kernels instead of Mosaic-compiling them
INTERP = os.environ.get("PROVE_INTERPRET") == "1"
emit(step="devices", devices=str(jax.devices()), backend=jax.default_backend(),
     interpret=INTERP)

from pytorch_yolo_tpu.ops.pallas_kernels import (
    decode_score_head, decode_score_head_ref, nms_keep_pallas)
from pytorch_yolo_tpu.ops.nms import greedy_suppress, iou_matrix

def fetch(x):
    return np.asarray(x)  # real D2H fence (CLAUDE.md landmine)

# ---- 1. decode_score_head: tiny parity, then full-size timing -------------
rng = np.random.default_rng(0)
anchors = ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0))
raw_tiny = jnp.asarray(rng.normal(size=(1, 4, 4, 255)).astype(np.float32))
t0 = time.perf_counter()
got = fetch(decode_score_head(raw_tiny, anchors, 32, 80, interpret=INTERP))
compile_s = time.perf_counter() - t0
want = fetch(decode_score_head_ref(raw_tiny, anchors, 32, 80))
err = float(np.abs(got - want).max())
emit(step="decode_parity", max_abs_err=err, compile_s=round(compile_s, 1),
     ok=bool(err < 1e-3))

# timing on the real head shapes (batch 16, all 3 scales @416)
shapes = [(16, 13, 13, 255), (16, 26, 26, 255), (16, 52, 52, 255)]
raws = [jnp.asarray(rng.normal(size=s).astype(np.float32)) for s in shapes]
fns = [jax.jit(lambda r, st=st: decode_score_head(r, anchors, st, 80,
                                                  interpret=INTERP))
       for st in (32, 16, 8)]
for f, r in zip(fns, raws):
    fetch(f(r))  # compile
t0 = time.perf_counter()
for _ in range(20):
    outs = [f(r) for f, r in zip(fns, raws)]
fetch(outs[-1])
dt = (time.perf_counter() - t0) / 20
emit(step="decode_timing", ms_per_batch16_3heads=round(dt * 1e3, 3))

# ---- 2. nms_keep_pallas: parity on K=300, then timing ---------------------
k = 300
boxes = rng.uniform(0, 416, size=(4, k, 4)).astype(np.float32)
boxes[..., 2:] = boxes[..., :2] + rng.uniform(4, 120, size=(4, k, 2)).astype(np.float32)
score = np.sort(rng.uniform(0.05, 1.0, size=(4, k)).astype(np.float32))[:, ::-1]
valid = score > 0.1
cls = rng.integers(0, 5, size=(4, k)).astype(np.float32)
jb, jv, jc = jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(cls)
t0 = time.perf_counter()
keep = fetch(nms_keep_pallas(jb, jv, 0.45, cls_id=jc, interpret=INTERP))
compile_s = time.perf_counter() - t0
ok = True
for i in range(4):
    iou = np.asarray(iou_matrix(jnp.asarray(boxes[i])))
    iou = iou * (cls[i][:, None] == cls[i][None, :])  # class-wise masking
    ref = np.asarray(greedy_suppress(jnp.asarray(iou), jnp.asarray(valid[i]), 0.45))
    ok = ok and (keep[i] == ref).all()
emit(step="nms_parity", ok=bool(ok), compile_s=round(compile_s, 1))

nms_fn = jax.jit(lambda b, v, c: nms_keep_pallas(b, v, 0.45, cls_id=c,
                                                 interpret=INTERP))
fetch(nms_fn(jb, jv, jc))
t0 = time.perf_counter()
for _ in range(20):
    out = nms_fn(jb, jv, jc)
fetch(out)
emit(step="nms_timing", ms_per_batch4_k300=round((time.perf_counter() - t0) / 20 * 1e3, 3))

# ---- 3. fused vs unfused e2e ----------------------------------------------
from pytorch_yolo_tpu.api import Detector
MODEL = os.environ.get("PROVE_MODEL", "yolov3")
ITERS = int(os.environ.get("PROVE_E2E_ITERS", "15"))
imgs = rng.integers(0, 256, size=(16, 480, 640, 3), dtype=np.uint8)
for use_pallas, label in ((False, "unfused"), (True, "fused")):
    det = Detector.load(MODEL, use_pallas=use_pallas)
    fetch(det.raw_result(imgs, size=416, conf=0.6, iou=0.45).boxes)  # compile
    fetch(det.raw_result(imgs, size=416, conf=0.6, iou=0.45).boxes)  # warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        res = det.raw_result(imgs, size=416, conf=0.6, iou=0.45)
    fetch(res.boxes)
    dt = (time.perf_counter() - t0) / ITERS
    emit(step=f"e2e_{label}", model=MODEL, ms_per_batch16=round(dt * 1e3, 2),
         img_per_s=round(16 / dt, 1))

emit(step="done")
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--out", default="/tmp/pallas_proof.jsonl")
    ap.add_argument("--retries", type=int, default=0,
                    help="fresh-child retries if acquisition hangs/fails "
                         "(axon grants don't queue; see CLAUDE.md)")
    ap.add_argument("--retry-wait", type=int, default=120)
    args = ap.parse_args()

    rc = 1
    for attempt in range(args.retries + 1):
        if attempt:
            print(f"retry {attempt}/{args.retries} in {args.retry_wait}s",
                  file=sys.stderr)
            import time

            time.sleep(args.retry_wait)
        rc = _run_once(args)
        if rc == 0:
            break
    return rc


def _run_once(args) -> int:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    # append: a retry must not truncate evidence a previous attempt banked
    with open(args.out, "a") as sink, open(args.out + ".stderr", "a") as err_sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", CHILD],
                                stdout=subprocess.PIPE, stderr=err_sink,
                                text=True, env=env, cwd=repo)
        rc = 0
        try:
            import threading

            def pump():
                for line in proc.stdout:
                    sys.stdout.write(line)
                    sys.stdout.flush()
                    sink.write(line)
                    sink.flush()

            t = threading.Thread(target=pump, daemon=True)
            t.start()
            proc.wait(timeout=args.timeout)
            t.join(timeout=10)
            rc = 0 if proc.returncode == 0 else 2
            if rc:
                print(f"child rc={proc.returncode}; stderr tail:", file=sys.stderr)
                with open(err_path) as f:
                    print("".join(f.readlines()[-15:]), file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT after {args.timeout}s — killing child "
                  "(expect a multi-minute grant release)", file=sys.stderr)
            proc.kill()
            rc = 3
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
