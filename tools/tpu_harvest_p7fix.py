"""Confirm the in-program bias-correct fix on p7, then bank its default row.

The p7 diag (perf/harvest_p7diag_r4.jsonl) isolated the round-4 p7 int8sb
compile crash to the legs containing percentile+bias-correct; plain and
smooth-only calibration compiled and ran.  bias_correct_params then got the
mechanically-certain fix (in-program twin convs, KB-sized outputs instead
of returning every conv input at 1536² — tens of GB).  This harvest:

  1. pct+bc through the FIXED path (the diag's crashing leg 2) — if it
     compiles, bc's output explosion was the killer and percentile's
     in-program sorts are fine;
  2. full recipe (diag leg 4) — the shipped calibration default;
  3. the banked-row equivalent: p7 int8sb@640 b8 via bench's loader under
     the shipped defaults (harvest_r4 step 8, crashed twice) with its
     bf16 control — completes the size-aware-default A/B table.

  python tools/tpu_harvest_p7fix.py [--retries 4] [--timeout 2400]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax.numpy as jnp
from pytorch_yolo_tpu.api import Detector

rng = np.random.default_rng(0)
CALIB = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
         for i in range(4)]

def leg(**kw):
    det = Detector.load("yolov4-p7", quant="w8a8",
                        compute_dtype=jnp.bfloat16, precision="default",
                        quant_calib=CALIB, **kw)
    imgs = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    np.asarray(det.raw_result(imgs, size=640, conf=0.6).boxes)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        r = det.raw_result(imgs, size=640, conf=0.6)
    np.asarray(r.boxes)
    return 24 / (time.perf_counter() - t0)

guard(1, "p7_es32_pct_bc_fixed", lambda: leg(quant_calib_percentile=99.9,
                                             quant_bias_correct=True))
guard(2, "p7_es32_full_recipe_fixed", lambda: leg(quant_recipe="auto"))

def compute(model, size, batch, dtype, iters=5, chain=1):
    return bench.measure_compute(model, size, batch, iters, dtype,
                                 "default", chain=chain)

guard(3, "p7_bf16_640_b8_control", lambda: compute("yolov4-p7", 640, 8,
                                                   "bfloat16"))
guard(4, "p7_int8sb_640_b8_new_default", lambda: compute("yolov4-p7", 640,
                                                         8, "int8sb"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_p7fix_r4.jsonl",
                                  default_retries=4, default_timeout=2400))
