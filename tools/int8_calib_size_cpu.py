"""Calibration-set size sensitivity for the smooth int8 recipe (CPU).

How many calibration images does `--int8-smooth` need?  For n in the
ladder, calibrate on the FIRST n of a fixed synthetic pool, then measure
post-NMS set agreement vs fp32/HIGHEST on a SEPARATE held-out image set
(drift images never overlap calibration images, so the answer measures
generalization of the scales, not calibration-set fit).

Rows append to perf/int8_calib_size_r3.jsonl.  Same transferability
argument as tools/int8_attrib_cpu.py: int8 arithmetic is exact on both
backends, so the n-ordering transfers to TPU; absolutes re-pin on asset
day with real images.

Usage: python tools/int8_calib_size_cpu.py [--model yolov3-tiny]
           [--size 416] [--sizes 1 2 4 8] [--eval-imgs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from pytorch_yolo_tpu.api import Detector  # noqa: E402
from pytorch_yolo_tpu.utils.drift import measure_mode_drift  # noqa: E402


def emit(out_path: str, **row) -> None:
    row_json = json.dumps(row)
    print(row_json, flush=True)
    with open(out_path, "a") as f:
        f.write(row_json + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3-tiny")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--sizes", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--eval-imgs", type=int, default=3)
    ap.add_argument("--out", default="perf/int8_calib_size_r3.jsonl")
    args = ap.parse_args()

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    pool = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(max(args.sizes))]
    held_out = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                for _ in range(args.eval_imgs)]

    ref = Detector.load(args.model)  # fp32/HIGHEST parity reference
    spec = ref.spec
    host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
            for k, v in ref.params.items()}
    emit(args.out, step="setup", model=args.model, size=args.size,
         backend=jax.default_backend(), sizes=args.sizes,
         eval_imgs=args.eval_imgs)

    for n in args.sizes:
        t1 = time.perf_counter()
        det = Detector(spec, host, compute_dtype=jnp.bfloat16,
                       precision="default", quant="w8a8",
                       quant_calib=pool[:n], quant_smooth=0.5)
        s = measure_mode_drift(ref, det, held_out, size=args.size)
        emit(args.out, step="calib_size", n_calib=n,
             config="int8sb+smooth0.5",
             set_agreement=round(s.set_agreement, 4),
             box_p99_px=round(s.box_p99_px, 3),
             score_p99=round(s.score_p99, 5),
             seconds=round(time.perf_counter() - t1, 1))

    emit(args.out, step="done", total_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
