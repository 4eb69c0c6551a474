"""Round-5 TPU harvest (one acquisition, safe->risky): evidence-integrity
re-banks from VERDICT r4.

  1. weather controls: yolov3 bf16 b64 / b128-chain8 headline class + the
     transfer-inclusive pipelined row (headline honesty, VERDICT r3 #9);
  2. LIVE-REGIME drift tables (VERDICT r4 weak #2): every drift row ever
     banked before round 5 used plain He synthetic weights, which saturate
     deep models' head sigmoids to exactly 1.0 and border-clamp every box
     — box_p99_px/score_p99 read 0.0 as an artifact.  bench.measure_drift
     now loads LSUV-equalized weights (synthetic="live",
     weights.equalize_raw_params) and carries liveness diagnostics; these
     steps re-bank yolov3 + csp at n=4 held-out with all three metric
     channels live for the first time, re-testing the recipe-auto
     calibration default (int8sb+recipe vs int8sb rows) on a live metric;
  3. first-ever p6 drift row (VERDICT r4 weak #3: SERVING.md recommended
     int8 for p6 with no drift evidence at all);
  4. native-size int8sb A/Bs (VERDICT r4 weak #3): p5@896b8 and p6@1280b2
     int8sb-vs-bf16 same-session — every prior A/B was at 416/640 while
     SERVING.md recommends int8 at the native sizes; the spatial-extent
     theory (p7 postmortem) predicts int8 may LOSE at 160-square early
     stages, so the recommendation must be scoped to what these rows say.

  python tools/tpu_harvest_r5.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r5.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
def compute(model, size, batch, dtype, iters=10, chain=1):
    return bench.measure_compute(model, size, batch, iters, dtype,
                                 "default", chain=chain)

# --- 1. weather controls + headline honesty rows ------------------------
guard(1, "control_yolov3_bf16_b64",
      lambda: compute("yolov3", 416, 64, "bfloat16", iters=15))
guard(2, "headline_bf16_b128_chain8",
      lambda: compute("yolov3", 416, 128, "bfloat16", iters=10, chain=8))
guard(3, "pipelined_u8_bf16_b16",
      lambda: bench.measure_tpu_pipelined("yolov3", 416, 16, 10,
                                          "bfloat16", "default"))

# --- 2. live-regime drift re-banks (first nonzero box/score channels) ---
guard(4, "drift_yolov3_live_n4",
      lambda: bench.measure_drift("yolov3", 416, n_imgs=4))
guard(5, "drift_csp_live_n4",
      lambda: bench.measure_drift("yolov4-csp", 416, n_imgs=4))

# --- 3. first p6 drift row (live regime) --------------------------------
guard(6, "drift_p6_live_n4",
      lambda: bench.measure_drift("yolov4-p6", 640, n_imgs=4))

# --- 4. native-size int8sb A/Bs (shipped defaults, no env overrides) ----
guard(7, "p5_bf16_896_b8_control",
      lambda: compute("yolov4-p5", 896, 8, "bfloat16", iters=5))
guard(8, "p5_int8sb_896_b8_defaults",
      lambda: compute("yolov4-p5", 896, 8, "int8sb", iters=5))
guard(9, "p6_bf16_1280_b2_control",
      lambda: compute("yolov4-p6", 1280, 2, "bfloat16", iters=3))
guard(10, "p6_int8sb_1280_b2_defaults",
      lambda: compute("yolov4-p6", 1280, 2, "int8sb", iters=3))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5.jsonl",
                                  default_timeout=3600))
