"""Round-3 final-defaults TPU harvest (one acquisition, safe->risky).

Round 3 changed three shipped defaults on banked evidence:
  * bench --chain defaults to 8 in compute mode (large steps 14-17),
  * the int8 early-layer skip engages for early-pool-free models
    regardless of stem activation (ops/quant.early_skip_profitable;
    large steps 12-13 flipped csp int8 from -7% to ~+3% vs bf16),
  * measure_drift grew an "int8sb(served)" row (the --int8 --bf16 combo
    as deployed, early skip included).

This child re-measures everything THROUGH those defaults, front to back,
so the round-end evidence reflects the code a user gets:

  1. the exact driver headline (yolov3@416 b128 bf16 chain=8),
  2. weather control (yolov3 bf16 b64 chain=1 — comparable to every
     prior session's control),
  3. csp / v4 int8sb at b64 via the new default (expect ~1378 / ~1231),
  4. csp drift incl. the new int8sb(served) row (skip engaged; the
     question it closes: does skipping early mish convs move drift?),
  5. yolov4-p5 int8sb b32 (new datum) vs its bf16 control,
  6. yolov3 int8sb b128 chain8 (the 1824 top row) via defaults.

  python tools/tpu_harvest_final_r3.py [--retries 5] [--timeout 3600] \
      [--out perf/final_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "headline_yolov3_bf16_b128_chain8",
      lambda: bench.measure_compute("yolov3", 416, 128, 15,
                                    "bfloat16", "default", chain=8))

guard(2, "control_yolov3_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "bfloat16", "default"))

guard(3, "csp_int8sb_default_b64",
      lambda: bench.measure_compute("yolov4-csp", 416, 64, 10,
                                    "int8sb", "default"))

guard(4, "v4_int8sb_default_b64",
      lambda: bench.measure_compute("yolov4", 416, 64, 10,
                                    "int8sb", "default"))

guard(5, "drift_csp_with_served_row",
      lambda: bench.measure_drift("yolov4-csp", 416, n_imgs=2))

guard(6, "p5_bf16_b32_control",
      lambda: bench.measure_compute("yolov4-p5", 416, 32, 8,
                                    "bfloat16", "default"))

guard(7, "p5_int8sb_b32",
      lambda: bench.measure_compute("yolov4-p5", 416, 32, 8,
                                    "int8sb", "default"))

guard(8, "yolov3_int8sb_b128_chain8",
      lambda: bench.measure_compute("yolov3", 416, 128, 8,
                                    "int8sb", "default", chain=8))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/final_r3.jsonl",
                                  default_timeout=3600))
