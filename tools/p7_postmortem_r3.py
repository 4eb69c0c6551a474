"""yolov4-p7 int8 postmortem (roadmap r4 #6, one acquisition).

Session 11 measured p7 int8sb at −9.5% vs bf16 (139.1 vs 153.7 @640 b8)
while p5 GAINS +3.8% from the same early-skip default — the only zoo
model where the family trend inverts with depth.  This child attributes
it: pipeline split (letterbox/forward/decode/NMS) and per-stride-stage
prefix profile for both dtypes, so the loss lands on a stage (the
stride-64/128 tail's channel-fat convs? the 4-anchor heads' requant? the
5-head decode share?) instead of a guess.

  python tools/p7_postmortem_r3.py [--retries 5] [--timeout 3600] \
      [--out perf/p7_postmortem_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
MODEL, SIZE, B, ITERS = "yolov4-p7", 640, 8, 5

rng = np.random.default_rng(0)

def load(dtype_token):
    det, label = bench._load_detector(MODEL, dtype_token, "default", rng)
    return det

from pytorch_yolo_tpu.utils.profiling import (profile_pipeline,
                                              profile_stages,
                                              stage_cut_points)

def pipeline_split(dtype_token):
    det = load(dtype_token)
    rows = profile_pipeline(det, size=SIZE, batch=B, iters=ITERS)
    for r in rows:
        emit(step="pipeline_split", dtype=dtype_token, **r)
    return rows

def stage_profile(dtype_token):
    det = load(dtype_token)
    cuts = stage_cut_points(det.spec)
    rows = []
    for cut in cuts:  # one call per cut: each banked row survives a timeout
        row = profile_stages(det, size=SIZE, batch=B, iters=ITERS,
                             cuts=[cut])[0]
        prev = rows[-1]["cum_ms"] if rows else 0.0
        row["delta_ms"] = round(row["cum_ms"] - prev, 3)
        emit(step="stage_cut", dtype=dtype_token, **row)
        rows.append(row)
    return rows

guard(1, "pipeline_split_int8sb", lambda: pipeline_split("int8sb"))

guard(2, "pipeline_split_bf16", lambda: pipeline_split("bfloat16"))

guard(3, "stage_profile_int8sb", lambda: stage_profile("int8sb"))

guard(4, "stage_profile_bf16", lambda: stage_profile("bfloat16"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/p7_postmortem_r3.jsonl",
                                  default_timeout=3600))
