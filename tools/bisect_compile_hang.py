"""Bisect which compile hangs the remote TPU toolchain for a model config.

Round-2 finding (PERF.md): yolov2-tiny's FUSED pipeline compile hung >900 s
twice, while `PYTORCH_YOLO_NO_PALLAS=1` compiled immediately — but the
responsible sub-program was never isolated (the fused decode kernel shape is
shared with yolov2, which compiles fine, so the naive suspect is exonerated).
This tool runs a ladder of increasingly-complete programs, EACH in a fresh
watchdogged child process, appending one JSONL row per probe, so a hang
costs one bounded child instead of a wedged session.

USE EARLY IN A ROUND (single-tenant tunnel: a hung remote compile can wedge
the far side for hours — do not run this right before the driver's bench).

  python tools/bisect_compile_hang.py [--model yolov2-tiny] [--timeout 240]
      [--settle 60] [--out /tmp/bisect.jsonl] [--probes a,b,...]

CPU smoke (harness mechanics only): JAX_PLATFORMS=cpu + --timeout 600.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

PROBE_SRC = r"""
import json, os, sys, time
import numpy as np

probe = os.environ["BISECT_PROBE"]
model = os.environ.get("BISECT_MODEL", "yolov2-tiny")

import bench  # repo-root bench.py
bench._honor_jax_platforms_env()
import jax
import jax.numpy as jnp

from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

# NOTE: deliberately no compile cache — a probe must exercise the *fresh*
# compile that hangs.
spec = model_spec(model)
params = jax.tree_util.tree_map(
    jnp.asarray, fold_batchnorm(spec, random_raw_params(spec, seed=0)))
rng = np.random.default_rng(0)
t0 = time.perf_counter()

if probe == "forward":  # plain XLA forward only
    from pytorch_yolo_tpu.models.darknet import build_forward
    x = jnp.asarray(rng.random((4, 416, 416, 3)).astype(np.float32))
    fn = jax.jit(build_forward(spec, compute_dtype=jnp.bfloat16,
                               precision="default"))
    np.asarray(fn(params, x)[0])
elif probe == "decode_pallas":  # fused decode kernels for every head
    # CAVEAT (learned on hardware, r3): the un-jitted forward here compiles
    # each op separately over the tunnel (~15-30 s per op), so a short
    # --timeout times out on compile latency, not the decode kernel.  Use
    # decode_direct to isolate the kernel itself.
    from pytorch_yolo_tpu.models.darknet import build_forward
    from pytorch_yolo_tpu.ops.pallas_kernels import decode_score_all
    x = jnp.asarray(rng.random((4, 416, 416, 3)).astype(np.float32))
    heads = build_forward(spec)(params, x)
    rows = decode_score_all(tuple(heads), spec, 416, use_pallas=True)
    np.asarray(rows)
elif probe == "decode_direct":  # decode kernel alone, synthetic head input
    from pytorch_yolo_tpu.models.darknet import head_shapes
    from pytorch_yolo_tpu.ops.pallas_kernels import decode_score_all
    shapes = head_shapes(spec, 416, batch=4)
    heads = tuple(jnp.asarray(rng.normal(size=s).astype(np.float32))
                  for s in shapes)
    rows = decode_score_all(heads, spec, 416, use_pallas=True)
    np.asarray(rows)
elif probe == "nms_pallas":  # NMS kernel alone at serving batch
    from pytorch_yolo_tpu.ops.pallas_kernels import nms_keep_pallas
    boxes = jnp.asarray(rng.uniform(0, 416, (64, 300, 4)).astype(np.float32))
    valid = jnp.ones((64, 300), bool)
    cls = jnp.asarray(rng.integers(0, 80, (64, 300)).astype(np.float32))
    np.asarray(nms_keep_pallas(boxes, valid, 0.45, cls_id=cls))
elif probe in ("pipeline_fused", "pipeline_nopallas"):
    from pytorch_yolo_tpu.api import Detector, _PipelineKey
    det = Detector(spec, params, compute_dtype=jnp.bfloat16,
                   precision="default",
                   use_pallas=(probe == "pipeline_fused"))
    imgs = rng.integers(0, 256, (64, 480, 640, 3), dtype=np.uint8)
    key = _PipelineKey(batch=64, orig_h=480, orig_w=640, size=416,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    np.asarray(det._pipeline(key)(det.params, jax.device_put(imgs)).boxes)
else:
    raise SystemExit(f"unknown probe {probe!r}")

print(json.dumps({"probe": probe, "model": model, "ok": True,
                  "seconds": round(time.perf_counter() - t0, 1)}), flush=True)
"""

DEFAULT_PROBES = ("forward", "decode_pallas", "nms_pallas",
                  "pipeline_nopallas", "pipeline_fused")


def run_probe(name: str, args) -> dict:
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["BISECT_PROBE"] = name
    env["BISECT_MODEL"] = args.model
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", "-c", PROBE_SRC],
            capture_output=True, text=True, env=env, cwd=repo,
            timeout=args.timeout)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            row = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            row = {"probe": name, "model": args.model, "ok": False,
                   "rc": proc.returncode, "stderr": proc.stderr[-400:]}
    except subprocess.TimeoutExpired:
        row = {"probe": name, "model": args.model, "ok": False,
               "hung": True, "seconds": round(time.perf_counter() - t0, 1)}
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov2-tiny")
    ap.add_argument("--timeout", type=int, default=240,
                    help="per-probe bound; a hang costs exactly this long")
    ap.add_argument("--settle", type=int, default=60,
                    help="seconds between probes (grant release)")
    ap.add_argument("--out", default="/tmp/bisect.jsonl")
    ap.add_argument("--probes", default=",".join(DEFAULT_PROBES))
    args = ap.parse_args()

    hung = []
    with open(args.out, "a") as sink:
        for i, name in enumerate(p for p in args.probes.split(",") if p):
            if i:
                time.sleep(args.settle)
            row = run_probe(name, args)
            print(json.dumps(row), flush=True)
            sink.write(json.dumps(row) + "\n")
            sink.flush()
            if row.get("hung"):
                hung.append(name)
                # a hang may leave the far side unhealthy; stretch the settle
                time.sleep(args.settle)
    if hung:
        print(f"HUNG probes: {hung}", file=sys.stderr)
    return 1 if hung else 0


if __name__ == "__main__":
    raise SystemExit(main())
