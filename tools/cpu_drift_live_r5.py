"""Re-test the recipe-auto calibration default on the LIVE drift regime (CPU).

The shipped decision "`--int8-recipe auto` (p99.9 + smooth + bias-correct)
is the best zero-cost recipe on ALL 6 CPU-drift families" (SERVING.md §2,
PERF.md r3 session 7) was measured on plain He synthetic weights — a
regime VERDICT r4 proved degenerate for the deep families (yolov3, spp,
v2: every ref score saturated at exactly 1.0, ranking degenerate).  The
shallow families (tiny, v2-tiny, v4-tiny) were unsaturated and their rows
stand.

This tool re-banks the per-family recipe A/B on LSUV-equalized weights
(``synthetic="live"``, weights.equalize_raw_params) with all three metric
channels live: for each family, drift vs fp32/HIGHEST of

  - bf16              (the no-quant serving control)
  - int8sb(plain)     (static scales, bf16 glue, quant_recipe="none")
  - int8sb+recipe     (quant_recipe="auto" — the calibration default)

at n=4 held-out eval images, 4 separate calibration frames (the measured
saturation minimum, perf/int8_calib_size_r3.jsonl).  CPU-only: int8 math
is exact integer arithmetic on both backends and the glue is bf16-class
on both, so the *relative* recipe-vs-plain ordering transfers; TPU serves
the absolute bound for the flagship (perf/harvest_r5.jsonl).

  python tools/cpu_drift_live_r5.py [--families yolov3 ...] [--imgs 4]
      [--out perf/cpu_drift_live_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# CPU pinning landmine (CLAUDE.md): env var BEFORE importing jax, then the
# config update — neither alone reliably keeps a process off the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from pytorch_yolo_tpu.api import Detector  # noqa: E402
from pytorch_yolo_tpu.utils.drift import measure_mode_drift  # noqa: E402

FAMILIES = {
    # family: (eval size, deep? — deep = the regime change matters)
    "yolov3": (416, True),
    "yolov3-spp": (416, True),
    "yolov2": (416, True),
    "yolov3-tiny": (416, False),
    "yolov2-tiny": (416, False),
    "yolov4-tiny": (416, False),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=list(FAMILIES))
    ap.add_argument("--imgs", type=int, default=4)
    ap.add_argument("--out", default="perf/cpu_drift_live_r5.jsonl")
    args = ap.parse_args()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    sink = open(args.out, "a")

    def emit(**kw):
        line = json.dumps(kw)
        print(line, flush=True)
        sink.write(line + "\n")
        sink.flush()

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(args.imgs)]
    calib = [np.random.default_rng(100 + i).integers(
        0, 256, (480, 640, 3), dtype=np.uint8) for i in range(4)]

    for fam in args.families:
        size, deep = FAMILIES.get(fam, (416, True))
        t0 = time.perf_counter()
        ref = Detector.load(fam, synthetic="live")
        host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                for k, v in ref.params.items()}
        modes = {
            "bf16": dict(compute_dtype=jnp.bfloat16, precision="default"),
            "int8sb_plain": dict(quant="w8a8", compute_dtype=jnp.bfloat16,
                                 precision="default", quant_calib=calib,
                                 quant_calib_size=size,
                                 quant_recipe="none"),
            "int8sb_recipe": dict(quant="w8a8", compute_dtype=jnp.bfloat16,
                                  precision="default", quant_calib=calib,
                                  quant_calib_size=size,
                                  quant_recipe="auto"),
        }
        for name, kw in modes.items():
            det = Detector(ref.spec, host, **kw)
            s = measure_mode_drift(ref, det, imgs, size=size)
            emit(family=fam, size=size, deep_regime_change=deep, mode=name,
                 set_agreement=round(s.set_agreement, 4),
                 box_p99_px=round(s.box_p99_px, 3),
                 score_p99=round(s.score_p99, 5),
                 ref_sat_frac=round(s.ref_sat_frac, 3),
                 zero_dev_frac=round(s.zero_dev_frac, 3),
                 ref_score_spread=round(s.ref_score_spread, 4),
                 degenerate=s.degenerate, regime="live",
                 seconds=round(time.perf_counter() - t0, 1))
    emit(step="done")
    sink.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
