"""Round-5 harvest D: the yolov4 live-regime drift row.

Completes the v4-family live accuracy coverage (csp banked in r5b,
p5/p6 in r5b/r5c).  yolov4x-mish is deliberately NOT measured: its
equalized synthetic regime is marginal — CPU precheck measured head
scores 0.37-0.42 (zero detections at the standard drift conf 0.5, and a
p95-p5 spread of 0.029, barely above the 0.02 ranking-tie flag) — the
mish-heavy x1.25/x1.33 stack compresses equalized head logits below the
sigmoid midpoint, so any banked row would be regime noise, exactly what
the DriftStats degeneracy guard exists to keep out of the tables.

  python tools/tpu_harvest_r5d.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r5d.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "drift_v4_416_live",
      lambda: bench.measure_drift("yolov4", 416, n_imgs=4))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5d.jsonl",
                                  default_timeout=3600))
