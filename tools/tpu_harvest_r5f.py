"""Round-5 harvest F: the yolov4x-mish live drift row.

Session D excluded x-mish because its 4-sweep equalized regime was
marginal (head scores 0.37-0.42, ranking-tie spread 0.029).  The
convergence-based equalizer (22d0e6e — sweeps until every unbounded
conv's |log std| < 0.1, ~8 sweeps for the 207-layer mish stack) spreads
its scores to 0.42-0.61 / spread 0.107, so the family's drift row can
now be banked rather than excluded.  NOTE: measure_mode_drift's conf=0.5
sits inside x-mish's converged score range, so detections exist at the
standard threshold.

  python tools/tpu_harvest_r5f.py [--retries 3] [--timeout 3600] \
      [--out perf/harvest_r5f.jsonl]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
guard(1, "drift_xmish_416_live",
      lambda: bench.measure_drift("yolov4x-mish", 416, n_imgs=4))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r5f.jsonl",
                                  default_timeout=3600))
