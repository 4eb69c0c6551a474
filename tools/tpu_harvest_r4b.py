"""Round-4 follow-up harvest: headline-dtype A/B under the shipped defaults.

SERVING.md's recommended yolov3 mode is now `--int8 --bf16 --int8-calib`
with the recipe as the calibration default, and its TPU accuracy bound is
banked (served agreement 0.9425, perf/harvest_r4.jsonl step 5).  The r3
bank has int8sb b128-chain8 at 1824-1830 img/s (plain calibration,
perf/large_r3.jsonl step 17 / final_r3) vs the bf16 headline class ~1490.
Before bench.py's default dtype can flip to the recommended mode, the
number must reproduce under the NEW defaults (recipe-auto calibration +
size-aware skip) with a same-session bf16 control:

  1. bf16   b128 chain8  (control — the current headline class)
  2. int8sb b128 chain8  (the candidate headline: recipe-auto via bare
     quant_calib, early-skip es8, s2d stem)
  3. int8sb b128 chain1  (headline-honesty discipline: the unchained row
     always rides beside the chained one — VERDICT r3 #9)
  4. int8sb b64 chain8   (the serving-guide batch for latency-sensitive
     deployments; r3 banked 1602 unchained es8)

  python tools/tpu_harvest_r4b.py [--retries 5] [--timeout 2400]
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

guard(1, "yolov3_bf16_b128_c8_control",
      lambda: compute("yolov3", 416, 128, "bfloat16", iters=10, chain=8))
guard(2, "yolov3_int8sb_b128_c8_defaults",
      lambda: compute("yolov3", 416, 128, "int8sb", iters=10, chain=8))
guard(3, "yolov3_int8sb_b128_c1",
      lambda: compute("yolov3", 416, 128, "int8sb", iters=10))
guard(4, "yolov3_int8sb_b64_c8",
      lambda: compute("yolov3", 416, 64, "int8sb", iters=10, chain=8))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r4b.jsonl",
                                  default_timeout=2400))
