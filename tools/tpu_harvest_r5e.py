"""Round-5 harvest E: recommended-mode headline reproduction.

r4b banked the recommended serving mode at the headline batch (int8sb
1838 vs bf16 1490, b128-chain8).  Round 5 re-measured the bf16 headline
(1490.9, session A) but never the int8sb side; this session banks the
same-acquisition pair so the round's recommended-mode number carries its
own weather control.

  python tools/tpu_harvest_r5e.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r5e.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "headline_bf16_b128_chain8_control",
      lambda: bench.measure_compute("yolov3", 416, 128, 10, "bfloat16",
                                    "default", chain=8))
guard(2, "headline_int8sb_b128_chain8",
      lambda: bench.measure_compute("yolov3", 416, 128, 10, "int8sb",
                                    "default", chain=8))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5e.jsonl",
                                  default_timeout=3600))
