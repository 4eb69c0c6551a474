"""Round-4 TPU harvest (one acquisition, safe->risky): close the
proves-what-it-recommends gaps from VERDICT r3.

  1. weather controls: yolov3 bf16 b64 / b128-chain8 (the headline class),
     plus the transfer-inclusive pipelined row (headline-honesty discipline,
     VERDICT r3 #9);
  2. drift tables at n_imgs=4 held-out (ADVICE r3: the r3 bank used n=2)
     for yolov3 and csp — now including the SERVING.md-recommended
     ``int8sb+recipe(served)`` mode (VERDICT r3 #1: the recommended config
     finally gets its own TPU accuracy bound; if the CPU ladder's lift
     reproduces, quant_recipe="auto" becomes the calibration default);
  3. size-aware early-skip defaults A/B (VERDICT r3 #2): p7@640 through the
     NEW defaults (ops/quant.default_early_min_stride -> es32; must meet the
     banked es32 row 152.3 vs bf16 154.6), p6@640 es8/es16/es32 ladder (es8
     tied bf16 in r3; the ladder decides whether the stride-128 rule should
     widen), p5@416 + x-mish@640 unchanged-default controls (their es8 wins
     must NOT regress).

  python tools/tpu_harvest_r4.py [--retries 5] [--timeout 3600] \
      [--out perf/harvest_r4.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
def es(value):
    # Early-skip threshold override for one measurement (the same env the
    # deployment remedy uses; None restores the shipped default policy).
    if value is None:
        os.environ.pop("PYTORCH_YOLO_INT8_EARLY_STRIDE", None)
    else:
        os.environ["PYTORCH_YOLO_INT8_EARLY_STRIDE"] = str(value)

def compute(model, size, batch, dtype, iters=10, chain=1):
    return bench.measure_compute(model, size, batch, iters, dtype,
                                 "default", chain=chain)

# --- 1. weather controls + headline honesty rows ------------------------
guard(1, "control_yolov3_bf16_b64",
      lambda: compute("yolov3", 416, 64, "bfloat16", iters=15))
guard(2, "headline_bf16_b128_chain8",
      lambda: compute("yolov3", 416, 128, "bfloat16", iters=10, chain=8))
guard(3, "headline_bf16_b128_unchained",
      lambda: compute("yolov3", 416, 128, "bfloat16", iters=10))
guard(4, "pipelined_u8_bf16_b16",
      lambda: bench.measure_tpu_pipelined("yolov3", 416, 16, 10,
                                          "bfloat16", "default"))

# --- 2. drift tables, n=4 held-out, with the recommended recipe mode ----
guard(5, "drift_yolov3_n4", lambda: bench.measure_drift("yolov3", 416,
                                                        n_imgs=4))
guard(6, "drift_csp_n4", lambda: bench.measure_drift("yolov4-csp", 416,
                                                     n_imgs=4))

# --- 3. size-aware early-skip defaults ----------------------------------
# p7 through the NEW default policy (no env): must reproduce the banked
# es32 row (152.3) now that default_early_min_stride gives 32 for the
# stride-128 ladder.
guard(7, "p7_bf16_640_b8_control",
      lambda: (es(None), compute("yolov4-p7", 640, 8, "bfloat16", iters=5))[1])
guard(8, "p7_int8sb_640_b8_new_default",
      lambda: (es(None), compute("yolov4-p7", 640, 8, "int8sb", iters=5))[1])

# p6 ladder: is the stride-128 rule too narrow?  r3 banked es8 194.9 vs
# bf16 193.5 (tie).  If es16/es32 clearly beat es8, the rule widens to
# stride-64 models (policy constant revisited in quant.py).
guard(9, "p6_bf16_640_b8_control",
      lambda: (es(None), compute("yolov4-p6", 640, 8, "bfloat16", iters=5))[1])
guard(10, "p6_int8sb_640_b8_es8_default",
      lambda: (es(None), compute("yolov4-p6", 640, 8, "int8sb", iters=5))[1])
guard(11, "p6_int8sb_640_b8_es16",
      lambda: (es(16), compute("yolov4-p6", 640, 8, "int8sb", iters=5))[1])
guard(12, "p6_int8sb_640_b8_es32",
      lambda: (es(32), compute("yolov4-p6", 640, 8, "int8sb", iters=5))[1])

# unchanged-default controls: the es8 winners must not regress under the
# new policy function (p5@416 banked 502.6 vs bf16 484.0).  NOTE the
# banked x-mish rows are @416 (566.4 int8sb, 548.1 bf16 — gaps_r3/csp_r3
# measured at 416, not 640): step 14's 640 row has no direct banked
# control; scale by (416/640)² ≈ 0.42 to compare (r4 measured 242.4,
# 566.4 × 0.42 ≈ 239 — consistent, no regression).
guard(13, "p5_int8sb_416_b32_control",
      lambda: (es(None), compute("yolov4-p5", 416, 32, "int8sb", iters=5))[1])
guard(14, "xmish_int8sb_640_b32_control",
      lambda: (es(None), compute("yolov4x-mish", 640, 32, "int8sb",
                                 iters=5))[1])

es(None)
emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_r4.jsonl",
                                  default_timeout=3600))
