"""p7 int8sb new-default compile-crash diagnostic (round 4).

harvest_r4 step 8 (yolov4-p7 int8sb through the NEW defaults: size-aware
es32 policy + recipe-auto calibration) crashed the REMOTE compiler twice,
reproducibly (HTTP 500, tpu_compile_helper subprocess exit 1) — while
r3's es32 row with PLAIN calibration compiled and measured 152.3
(perf/p7_es_ab_r3.jsonl), and p6's recipe rows (steps 10-12, mish + smooth
at 128M params) compiled fine this session.  Isolate which ingredient
kills the 339M-param program:

  1. es32 policy + quant_recipe="none"  (r3's working row through the new
     policy function — control: policy != env?)
  2. es32 + percentile+bc, NO smooth    (recipe minus the smooth grids)
  3. es32 + smooth only                 (the prime suspect)
  4. es32 + full recipe                 (the crashing step, re-confirm)

Each leg builds its own Detector directly (bench._load_detector has no
recipe/knob surface) and measures via det.raw_result on device-resident
input, 3 iters — enough to confirm compile+run, not a weather row.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax.numpy as jnp
from pytorch_yolo_tpu.api import Detector

SIZE, BATCH, ITERS = 640, 8, 3
rng = np.random.default_rng(0)
CALIB = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
         for i in range(4)]

def leg(**kw):
    det = Detector.load("yolov4-p7", quant="w8a8",
                        compute_dtype=jnp.bfloat16, precision="default",
                        quant_calib=CALIB, **kw)
    imgs = rng.integers(0, 256, (BATCH, 480, 640, 3), dtype=np.uint8)
    np.asarray(det.raw_result(imgs, size=SIZE, conf=0.6).boxes)  # compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = det.raw_result(imgs, size=SIZE, conf=0.6)
    np.asarray(r.boxes)
    return BATCH * ITERS / (time.perf_counter() - t0)

guard(1, "p7_es32_plain", lambda: leg(quant_recipe="none"))
guard(2, "p7_es32_pct_bc", lambda: leg(quant_calib_percentile=99.9,
                                       quant_bias_correct=True))
guard(3, "p7_es32_smooth_only", lambda: leg(quant_smooth=0.5))
guard(4, "p7_es32_full_recipe", lambda: leg(quant_recipe="auto"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_p7diag_r4.jsonl",
                                  default_timeout=2400))
