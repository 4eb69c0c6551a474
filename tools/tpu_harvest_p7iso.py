"""p7 calibration compile-crash isolation: one jitted program per leg.

Round-4 state of the hunt (perf/harvest_p7diag_r4.jsonl,
perf/harvest_p7fix_r4.jsonl): every p7@1536-calibration leg containing
percentile+bias-correct crashes the remote compiler (tpu_compile_helper
exit 1), through THREE implementations — original bc (giant outputs),
in-program bc, and in-program bc + the log-histogram percentile estimator.
Percentile-free legs (plain max, smooth-only) compile and run.  The
remaining suspect set is {histogram pass, bc twin program}; every prior
leg compiled several programs back-to-back so the crash was never pinned
to one.  This harvest compiles ONE program per leg, safe->risky:

  1. pass1_maxima      — global-max stats forward @1536 (control class)
  2. pct_hist_whole    — log-histogram percentile, whole-tensor only
  3. pct_hist_perchan  — + per-channel histograms (what the recipe needs)
  4. bias_correct      — fp/int8 twin-conv program on max-calib scales
  5. full_recipe_load  — Detector.load(quant_recipe="auto") end-to-end
                         (only meaningful if 1-4 survive)

  python tools/tpu_harvest_p7iso.py [--retries 2] [--timeout 2400]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax
import jax.numpy as jnp

from pytorch_yolo_tpu.models.zoo import model_spec
from pytorch_yolo_tpu.models.darknet import build_forward
from pytorch_yolo_tpu.ops.preprocess import letterbox_host
from pytorch_yolo_tpu.ops import quant
from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

spec = model_spec("yolov4-p7")
params = fold_batchnorm(spec, random_raw_params(spec, seed=0))
rng = np.random.default_rng(0)
CALIB = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
         for _ in range(4)]
s = (spec.net.height, spec.net.width)
canvases = np.stack([letterbox_host(im, s, bgr=True)[0] for im in CALIB])
bench.log(f"canvases {canvases.shape} -> one program per leg")

def leg1():
    m1 = lambda i, t: jnp.max(jnp.abs(t))
    _, stats = jax.jit(build_forward(spec, collect_conv_in_stats=m1))(
        params, jnp.asarray(canvases, jnp.float32))
    return float(np.asarray(stats[0]))

def leg2():
    st = quant._collect_percentile_stats(spec, params, canvases, 99.9,
                                         per_channel=False)
    return float(np.asarray(st[0]))

def leg3():
    st = quant._collect_percentile_stats(spec, params, canvases, 99.9,
                                         per_channel=True)
    return float(np.asarray(st[0][0]))

def leg4():
    scales = quant.collect_act_scales(spec, params, canvases)
    qp = quant.quantize_params(spec, params, act_scales=scales)
    qp2, deltas = quant.bias_correct_params(spec, params, qp, canvases[:1])
    return float(len(deltas))

def leg5():
    from pytorch_yolo_tpu.api import Detector
    det = Detector(spec, params, quant="w8a8", compute_dtype=jnp.bfloat16,
                   precision="default", quant_calib=CALIB)
    imgs = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    np.asarray(det.raw_result(imgs, size=640, conf=0.6).boxes)
    t0 = time.perf_counter()
    for _ in range(3):
        r = det.raw_result(imgs, size=640, conf=0.6)
    np.asarray(r.boxes)
    return 24 / (time.perf_counter() - t0)

guard(1, "p7_pass1_maxima_1536", leg1)
guard(2, "p7_pct_hist_whole_1536", leg2)
guard(3, "p7_pct_hist_perchan_1536", leg3)
guard(4, "p7_bias_correct_1536", leg4)
guard(5, "p7_full_recipe_load_serve640", leg5)

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/harvest_p7iso_r4.jsonl",
                                  default_retries=2, default_timeout=2400))
