"""fp32/HIGH vs HIGHEST on TPU — detection-set comparison (VERDICT r2 #4).

The round-3 harvest's raw fixed-shape comparison (tools/tpu_harvest_r3.py
pin ladder) found HIGH is NOT bit-identical to HIGHEST at the array level:
score-tied candidate rows permute, one class argmax flipped, and tiny's
keep mask differed in a row.  This tool asks the question that decides the
parity-default: do the *valid detections* (the API's actual output)
differ, and by how much — per image, as sets, with exact matching.

Emits one JSON line per config:
  {model, size, batch, n_high, n_highest, exact_set_equal,
   matched_fraction, worst_box_px, n_cls_flips}

  python tools/pin_precision_r3.py [--timeout 900] [--out ...]

Runs in a watchdogged child (single-tenant tunnel rules).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, time
import numpy as np

import bench
bench._honor_jax_platforms_env()
import jax

from pytorch_yolo_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()

def emit(**kw):
    print(json.dumps(kw), flush=True)

emit(step="devices", devices=str(jax.devices()))

def valid_rows(res, i):
    m = np.asarray(res.valid[i])
    return (np.asarray(res.boxes[i])[m], np.asarray(res.obj[i])[m],
            np.asarray(res.cls_score[i])[m], np.asarray(res.cls_id[i])[m])

def compare(model, size, batch):
    from pytorch_yolo_tpu.api import Detector, _PipelineKey

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    key = _PipelineKey(batch=batch, orig_h=480, orig_w=640, size=size,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    out = {}
    for prec in ("highest", "high"):
        det = Detector.load(model, precision=prec)
        out[prec] = det._pipeline(key)(det.params, dev)
    n_hi = n_hst = n_match = cls_flips = 0
    worst_px = 0.0
    exact = True
    for i in range(batch):
        b1, o1, s1, c1 = valid_rows(out["highest"], i)
        b2, o2, s2, c2 = valid_rows(out["high"], i)
        n_hst += len(b1); n_hi += len(b2)
        if len(b1) != len(b2):
            exact = False
        if not len(b1) or not len(b2):
            continue
        # one-to-one nearest-box matching
        d = np.abs(b2[:, None, :] - b1[None, :, :]).max(-1)
        used = np.zeros(len(b1), bool)
        for j in range(len(b2)):
            k = int(np.argmin(np.where(used, np.inf, d[j])))
            if d[j, k] < 4.0 and not used[k]:
                used[k] = True
                n_match += 1
                worst_px = max(worst_px, float(d[j, k]))
                if c2[j] != c1[k]:
                    cls_flips += 1
                if d[j, k] != 0.0 or c2[j] != c1[k] or o2[j] != o1[k]:
                    exact = False
            else:
                exact = False
    return {"model": model, "size": size, "batch": batch,
            "n_high": int(n_hi), "n_highest": int(n_hst),
            "exact_set_equal": bool(exact),
            "matched_fraction": round(n_match / max(n_hi, n_hst, 1), 4),
            "worst_box_px": round(worst_px, 4),
            "n_cls_flips": int(cls_flips)}

for model, size, batch in (("yolov3", 416, 16), ("yolov3", 608, 8),
                           ("yolov3-tiny", 416, 16), ("yolov3-tiny", 320, 16),
                           ("yolov3-spp", 416, 16), ("yolov2", 416, 16)):
    t0 = time.perf_counter()
    try:
        row = compare(model, size, batch)
        emit(step="pin_detail", seconds=round(time.perf_counter() - t0, 1),
             **row)
    except Exception as e:
        emit(step="pin_detail", model=model, size=size, error=str(e)[:300])

emit(step="done")
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--out", default="/root/repo/perf/pin_precision_r3.jsonl")
    args = ap.parse_args()
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    done = False
    with open(args.out, "a") as sink:
        proc = subprocess.Popen([sys.executable, "-u", "-c", CHILD],
                                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
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
