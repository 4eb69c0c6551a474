"""Round-3 family-table gap harvest (one short acquisition).

Closes the last unmeasured cells in the serving-mode family table:

  1. weather control (yolov3 bf16 b64),
  2. yolov3 int8sb batch-1 latency — the serving guide quotes 2.74 ms
     from the pre-early-skip quantize-all config; the shipped default
     (early skip + bf16 glue) has never been measured at b1,
  3. yolov4x-mish int8sb b32 (the only mish family without an int8sb
     row; early skip engages by default — bf16 row is 548),
  4. yolov4-p6 int8sb @640 b8 (bf16 row 193.5),
  5. yolov4-p7 int8sb @640 b8 (bf16 row 153.7) — completes the
     int8-vs-bf16 verdict for every zoo family.

  python tools/tpu_harvest_gaps_r3.py [--retries 5] [--timeout 3600] \
      [--out perf/gaps_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "control_yolov3_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "bfloat16", "default"))

guard(2, "yolov3_int8sb_b1_latency",
      lambda: bench.measure_compute("yolov3", 416, 1, 50,
                                    "int8sb", "default"))

guard(3, "xmish_int8sb_b32",
      lambda: bench.measure_compute("yolov4x-mish", 416, 32, 8,
                                    "int8sb", "default"))

guard(4, "p6_int8sb_640_b8",
      lambda: bench.measure_compute("yolov4-p6", 640, 8, 8,
                                    "int8sb", "default"))

guard(5, "p7_int8sb_640_b8",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 8,
                                    "int8sb", "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/gaps_r3.jsonl",
                                  default_timeout=3600))
