"""Round-5 harvest C: the p6 native-size (1280) drift row.

Completes the scaled-family accuracy story: sessions A/B banked p6@640
(matched-calib recipe 0.898) and the native-size speed A/B (+2.1% int8sb
at 1280b2), but SERVING.md's p6 row still says "no native-1280 drift row
yet".  This session banks it — calibration runs at 1280 (matched, both
via the net-size default and the explicit measure_drift size pass).

  python tools/tpu_harvest_r5c.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r5c.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "drift_p6_1280_native",
      lambda: bench.measure_drift("yolov4-p6", 1280, n_imgs=4))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5c.jsonl",
                                  default_timeout=3600))
