"""Batch-frontier + NMS-candidate harvest (one acquisition, safe->risky).

Round-3 session 3: two open sizing questions from PERF.md get measured
ends:

  1. **Batch frontier** — every banked pipeline row stops at b64; the
     roofline work (r2 sessions 16-21) showed per-op efficiency still
     rising with M (the b64 306-TOPS int8 row vs 174 at b16).  If b96/
     b128 keeps scaling, the bench headline's default batch should move.
     Rows: yolov3 bf16/int8sb at b64 (same-session control), b96, b128;
     tiny-class models at b256; yolov3@608 b32 for the multires frontier.
  2. **NMS candidate count (max_det)** — stage micros put the fixpoint
     NMS at ~12% of the b16 bf16 pipeline; PERF.md says "the lever is
     candidate-count tuning per deployment" with no number attached.
     Ladder: b64 bf16 at max_det 300/150/100/50 + a clipping check (how
     many synthetic-weight images actually produce >K candidates).

  python tools/tpu_harvest_frontier.py [--retries 5] [--timeout 3600] \
      [--out perf/frontier_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps (persistent XLA compile
cache makes retried compiles cheap).  Single-tenant landmines apply: ONE
patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax.numpy as jnp

guard(1, "yolov3_bf16_b64_ctl",
      lambda: bench.measure_compute("yolov3", 416, 64, 15, "bfloat16", "default"))

guard(2, "yolov3_bf16_b96",
      lambda: bench.measure_compute("yolov3", 416, 96, 12, "bfloat16", "default"))

guard(3, "yolov3_bf16_b128",
      lambda: bench.measure_compute("yolov3", 416, 128, 10, "bfloat16", "default"))

guard(4, "yolov3_int8sb_b64_ctl",
      lambda: bench.measure_compute("yolov3", 416, 64, 15, "int8sb", "default"))

guard(5, "yolov3_int8sb_b128",
      lambda: bench.measure_compute("yolov3", 416, 128, 10, "int8sb", "default"))

guard(6, "yolov3_bf16_b64_md150",
      lambda: bench.measure_compute("yolov3", 416, 64, 15, "bfloat16",
                                    "default", max_det=150))

guard(7, "yolov3_bf16_b64_md100",
      lambda: bench.measure_compute("yolov3", 416, 64, 15, "bfloat16",
                                    "default", max_det=100))

guard(8, "yolov3_bf16_b64_md50",
      lambda: bench.measure_compute("yolov3", 416, 64, 15, "bfloat16",
                                    "default", max_det=50))

def maxdet_clipping():
    from pytorch_yolo_tpu.api import Detector, _PipelineKey
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    det = Detector.load("yolov3")
    rows = {}
    for md in (300, 100, 50):
        key = _PipelineKey(batch=8, orig_h=480, orig_w=640, size=416,
                           conf=0.6, iou=0.45, max_det=md, bgr=True)
        res = det._pipeline(key)(det.params, dev)
        valid = np.asarray(res.valid)
        per_img = valid.sum(axis=1)
        rows[str(md)] = {"kept_mean": float(per_img.mean()),
                         "kept_max": int(per_img.max()),
                         "clipped_imgs": int((per_img == md).sum())}
    return rows

guard(9, "maxdet_clipping_fp32", maxdet_clipping)

guard(10, "v3tiny_bf16_b256",
      lambda: bench.measure_compute("yolov3-tiny", 416, 256, 10,
                                    "bfloat16", "default"))

guard(11, "v4tiny_bf16_b256",
      lambda: bench.measure_compute("yolov4-tiny", 416, 256, 10,
                                    "bfloat16", "default"))

guard(12, "yolov3_bf16_608_b32",
      lambda: bench.measure_compute("yolov3", 608, 32, 10,
                                    "bfloat16", "default"))

guard(13, "yolov3_int8sb_608_b32",
      lambda: bench.measure_compute("yolov3", 608, 32, 10,
                                    "int8sb", "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/frontier_r3.jsonl",
                                  default_retries=5,
                                  default_retry_wait=120,
                                  default_timeout=3600))
