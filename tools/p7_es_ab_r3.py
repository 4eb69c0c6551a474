"""p7 early-skip-threshold A/B (postmortem follow-up, one acquisition).

The p7 postmortem (perf/p7_postmortem_r3.jsonl) localized the int8 loss
to the stride-8/16 stages: at 640² input those are 80²/40² spatial maps
— above the win/loss boundary that sits between 52² (yolov3@416 stride-8,
int8 wins) and 80² (p7@640 stride-8, int8 loses ~1.8x).  The boundary is
SPATIAL EXTENT, not stride, so the fixed stride<8 skip under-skips large
inputs.  This child validates the mechanism with the existing knob:
`PYTORCH_YOLO_INT8_EARLY_STRIDE={16,32}` should recover the stride-8
(+~5 ms) and stride-16 (+~2 ms) losses and pull p7 int8sb from 139 back
to ≥ its 153.7 bf16 row.

  python tools/p7_es_ab_r3.py [--retries 5] [--timeout 3600] \
      [--out perf/p7_es_ab_r3.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
def es(stride, dtype="int8sb"):
    os.environ["PYTORCH_YOLO_INT8_EARLY_STRIDE"] = str(stride)
    try:
        return bench.measure_compute("yolov4-p7", 640, 8, 8, dtype, "default")
    finally:
        os.environ.pop("PYTORCH_YOLO_INT8_EARLY_STRIDE", None)

guard(1, "p7_bf16_b8_control",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 8,
                                    "bfloat16", "default"))

guard(2, "p7_int8sb_es8_default",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 8,
                                    "int8sb", "default"))

guard(3, "p7_int8sb_es16", lambda: es(16))

guard(4, "p7_int8sb_es32", lambda: es(32))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/p7_es_ab_r3.jsonl",
                                  default_timeout=3600))
