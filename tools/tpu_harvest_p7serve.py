"""Round-4 p7 serving verdict: int8sb under the SHIPPED defaults vs bf16.

VERDICT r3 #2's done-criterion for the size-aware early-skip default was
"p7@640 int8sb >= the es=32 row (152.3)" via *defaults*.  Round-4 shipped
the es32 default (stride-128 ladder class) and made recipe-auto the
calibration default, but the first attempt crashed the remote compiler on
the recipe's percentile/bias-correct calibration at p7's native 1536^2 —
since bisected and fixed (percentiles via count-reductions, f040f26; the
full-recipe Detector.load was confirmed end-to-end on silicon at 413 s,
perf/harvest_p7iso_r4.jsonl).  What is still unbanked is the COMPUTE-MODE
number under the final shipped defaults beside a same-session bf16
control:

  1. p7 bf16   @640 b8 chain1 (control; r3 class 148-154)
  2. p7 int8sb @640 b8 chain1 (shipped defaults: es32 size-aware skip +
     recipe-auto bisection calibration at native 1536)

  python tools/tpu_harvest_p7serve.py [--retries 3] [--timeout 2400]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "p7_bf16_640_b8_control",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 5, "bfloat16",
                                    "default"))
guard(2, "p7_int8sb_640_b8_defaults",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 5, "int8sb",
                                    "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_p7serve_r4.jsonl",
                                  default_timeout=2400))
