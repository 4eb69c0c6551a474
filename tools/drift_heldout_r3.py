"""Re-measure the serving drift tables with held-out calibration.

The code-review catch (r3 session 12 fixes): measure_drift's static-int8
rows calibrated on 2 images that were also the drift-eval images —
optimistic.  measure_drift now calibrates on 4 held-out frames; this
child re-banks the yolov3 and yolov4-csp tables through the fixed tool
so the quoted served-mode agreements are honest bounds.

  python tools/drift_heldout_r3.py [--retries 5] [--timeout 3600] \
      [--out perf/drift_heldout_r3.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "drift_yolov3_heldout",
      lambda: bench.measure_drift("yolov3", 416, n_imgs=2))

guard(2, "drift_csp_heldout",
      lambda: bench.measure_drift("yolov4-csp", 416, n_imgs=2))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/drift_heldout_r3.jsonl",
                                  default_timeout=3600))
