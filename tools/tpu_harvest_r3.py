"""Round-3 TPU measurement harvest (one acquisition, ordered safe->risky).

Targets the round-3 verdict items that need hardware:

  A. fp32/HIGH vs HIGHEST bit-compare ladder across the zoo (VERDICT r2 #4)
     — if identical everywhere, HIGH becomes the parity default.
  B. int8-static attribution + the int8-resident chain A/B (VERDICT r2 #1)
     — stage/pipeline splits for the static-int8 mode, then
     resident-vs-fp32-glue pipeline rows (PYTORCH_YOLO_NO_INT8_RESIDENT=1
     is the control), plus same-session bf16 baselines.
  C. serving drift of the new resident path + headline re-check.

The v2-tiny fused-compile bisect (VERDICT r2 #2) is NOT in this child —
run tools/bisect_compile_hang.py separately (its own watchdogged children)
AFTER this harvest has banked its rows.

  python tools/tpu_harvest_r3.py [--retries 6] [--timeout 1500] \
      [--out perf/harvest_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips already-banked steps (the persistent
XLA compile cache makes retried compiles cheap).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax.numpy as jnp

B = int(os.environ.get("HARVEST_BATCH", "16"))

ITERS = int(os.environ.get("HARVEST_ITERS", "20"))

def pin_high(model, size, batch):
    from pytorch_yolo_tpu.api import Detector, _PipelineKey

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    key = _PipelineKey(batch=batch, orig_h=480, orig_w=640, size=size,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    outs = {}
    for prec in ("highest", "high"):
        det = Detector.load(model, precision=prec)
        res = det._pipeline(key)(det.params, dev)
        outs[prec] = [np.asarray(a) for a in
                      (res.boxes, res.obj, res.cls_score, res.cls_id, res.valid)]
    diffs = [float(np.max(np.abs(a.astype(np.float64) - b.astype(np.float64))))
             for a, b in zip(outs["highest"], outs["high"])]
    return {"model": model, "size": size, "batch": batch,
            "bit_identical": all(d == 0.0 for d in diffs),
            "max_abs_diffs": diffs}

guard(2, "pin_yolov3_416_b16", lambda: pin_high("yolov3", 416, B))

guard(3, "pin_yolov3_608_b8", lambda: pin_high("yolov3", 608, B // 2))

guard(4, "pin_tiny_416_b16", lambda: pin_high("yolov3-tiny", 416, B))

guard(5, "pin_tiny_320_b16", lambda: pin_high("yolov3-tiny", 320, B))

guard(6, "pin_spp_416_b16", lambda: pin_high("yolov3-spp", 416, B))

guard(7, "pin_v2_416_b16", lambda: pin_high("yolov2", 416, B))

def int8s_det(model="yolov3", skip="heads"):
    from pytorch_yolo_tpu.api import Detector

    rng = np.random.default_rng(0)
    calib = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
             for _ in range(4)]
    return Detector.load(model, quant="w8a8", quant_skip_layers=skip,
                         quant_calib=calib, quant_recipe="none")

def int8s_pipeline_profile():
    from pytorch_yolo_tpu.utils.profiling import profile_pipeline
    return profile_pipeline(int8s_det(), size=416, batch=B,
                            iters=max(ITERS // 3, 2))

def int8s_stage_profile():
    from pytorch_yolo_tpu.utils.profiling import profile_stages
    return profile_stages(int8s_det(), size=416, batch=B,
                          iters=max(ITERS // 4, 2))

guard(8, "int8s_pipeline_profile_b16", int8s_pipeline_profile)

guard(9, "int8s_stage_profile_b16", int8s_stage_profile)

guard(10, "compute_int8s_b16_resident",
      lambda: bench.measure_compute("yolov3", 416, B, ITERS, "int8s", "default"))

guard(11, "compute_int8s_b64_resident",
      lambda: bench.measure_compute("yolov3", 416, 4 * B, max(ITERS // 2, 5),
                                    "int8s", "default"))

os.environ["PYTORCH_YOLO_NO_INT8_RESIDENT"] = "1"

guard(12, "compute_int8s_b16_glue",
      lambda: bench.measure_compute("yolov3", 416, B, ITERS, "int8s", "default"))

guard(13, "compute_int8s_b64_glue",
      lambda: bench.measure_compute("yolov3", 416, 4 * B, max(ITERS // 2, 5),
                                    "int8s", "default"))

del os.environ["PYTORCH_YOLO_NO_INT8_RESIDENT"]

guard(14, "compute_bf16_b16",
      lambda: bench.measure_compute("yolov3", 416, B, ITERS, "bfloat16", "default"))

guard(15, "compute_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 4 * B, max(ITERS // 2, 5),
                                    "bfloat16", "default"))

def compute_full_int8(batch, iters):
    from pytorch_yolo_tpu.api import _PipelineKey

    det = int8s_det(skip=())
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    key = _PipelineKey(batch=batch, orig_h=480, orig_w=640, size=416,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    fn = det._pipeline(key)
    np.asarray(fn(det.params, dev).boxes)
    t0 = time.perf_counter()
    for _ in range(iters):
        res = fn(det.params, dev)
    np.asarray(res.boxes)
    dt = time.perf_counter() - t0
    return batch * iters / dt

guard(16, "compute_int8s_full_b64",
      lambda: compute_full_int8(4 * B, max(ITERS // 2, 5)))

guard(17, "drift_resident_defaults",
      lambda: bench.measure_drift("yolov3", 416, n_imgs=2))

def drift_full_int8():
    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.utils.drift import measure_mode_drift

    ref = Detector.load("yolov3")
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(2)]
    s = measure_mode_drift(ref, int8s_det(skip=()), imgs, size=416)
    return {"mode": "int8s-full(resident)",
            "set_agreement": round(s.set_agreement, 4),
            "box_p99_px": round(s.box_p99_px, 3)}

guard(18, "drift_int8s_full", drift_full_int8)

guard(19, "tiny_int8s_b64_resident",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS,
                                    "int8s", "default"))

os.environ["PYTORCH_YOLO_NO_INT8_RESIDENT"] = "1"

guard(20, "tiny_int8s_b64_glue",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS,
                                    "int8s", "default"))

del os.environ["PYTORCH_YOLO_NO_INT8_RESIDENT"]

guard(21, "tiny_bf16_b64",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS,
                                    "bfloat16", "default"))

guard(22, "v2_int8s_b64_resident",
      lambda: bench.measure_compute("yolov2", 416, 4 * B, max(ITERS // 2, 5),
                                    "int8s", "default"))

guard(23, "v2_bf16_b64",
      lambda: bench.measure_compute("yolov2", 416, 4 * B, max(ITERS // 2, 5),
                                    "bfloat16", "default"))

guard(24, "int8s_b1_latency",
      lambda: bench.measure_compute("yolov3", 416, 1, 3 * ITERS,
                                    "int8s", "default"))

guard(25, "headline_bf16_b64_final",
      lambda: bench.measure_compute("yolov3", 416, 4 * B, max(ITERS // 2, 5),
                                    "bfloat16", "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "/tmp/tpu_harvest_r3.jsonl",
                                  default_retries=6,
                                  default_retry_wait=120,
                                  default_timeout=1500))
