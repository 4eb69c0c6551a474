"""Round-5 follow-up harvest: drift re-banks under MATCHED calibration size.

Session A (perf/harvest_r5.jsonl) exposed the calibration-size mismatch:
measure_drift calibrated at the cfg [net] size while evaluating at the
served size, so p6 (calib@1280, eval@640) collapsed to 0.11 static-int8
agreement while dynamic scales held 0.66, and csp ran mildly mismatched
(calib@512, eval@416).  bench.measure_drift now calibrates at the eval
size (0163cf5); this session re-banks the affected rows and adds the
p5 native-size drift row SERVING.md's recommendation was missing:

  1. drift p6@640 matched   (expect static int8 to recover to >= dynamic)
  2. drift csp@416 matched  (quantify what the mild mismatch cost)
  3. drift p5@896 matched   (native-size accuracy for the p5 int8 rec)

yolov3 needs no re-bank (416/416 was matched in session A).

  python tools/tpu_harvest_r5b.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r5b.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "drift_p6_640_matched_calib",
      lambda: bench.measure_drift("yolov4-p6", 640, n_imgs=4))
guard(2, "drift_csp_416_matched_calib",
      lambda: bench.measure_drift("yolov4-csp", 416, n_imgs=4))
guard(3, "drift_p5_896_matched_calib",
      lambda: bench.measure_drift("yolov4-p5", 896, n_imgs=4))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5b.jsonl",
                                  default_timeout=3600))
