"""YOLOv4-family TPU harvest (one acquisition, ordered safe->risky).

The v4 family (round 3: CSP split routes, mish, scale_x_y) is fully
parity-tested on CPU; this child banks the hardware evidence:

  1. fused Pallas decode with scale_x_y: exact-match vs the jnp reference
     ON the TPU (the r2 proof covered scale_xy=1.0 only),
  2. full-pipeline Pallas-vs-jnp A/B for yolov4-tiny (fp32),
  3. compute-mode throughput rows (bf16 / int8-static) for yolov4-tiny and
     the full yolov4 at b64, with a same-session yolov3 weather control,
  4. serving drift (bf16 / int8) vs fp32/HIGHEST for both models.

  python tools/tpu_harvest_v4.py [--retries 5] [--timeout 2400] \
      [--out perf/v4_family_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps (the persistent XLA
compile cache makes retried compiles cheap).  Single-tenant landmines
apply: ONE patient process, never probe/kill (CLAUDE.md).
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

def pallas_scale_xy_parity():
    from pytorch_yolo_tpu.ops.pallas_kernels import (decode_score_head,
                                                     decode_score_head_ref)

    anchors = ((23, 27), (37, 58), (81, 82))
    rng = np.random.default_rng(21)
    raw = jnp.asarray(rng.normal(0, 2, (4, 13, 13, 255)).astype(np.float32))
    rows = []
    for sxy in (1.0, 1.05, 1.2):
        ours = np.asarray(decode_score_head(raw, anchors, 32, 80,
                                            scale_xy=sxy, interpret=False))
        ref = np.asarray(decode_score_head_ref(raw, anchors, 32, 80,
                                               scale_xy=sxy))
        rows.append({"scale_xy": sxy,
                     "max_abs_err": float(np.max(np.abs(ours - ref)))})
    return rows

guard(1, "pallas_scale_xy_parity", pallas_scale_xy_parity)

def v4tiny_pallas_vs_jnp():
    from pytorch_yolo_tpu.api import Detector, _PipelineKey

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (8, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    key = _PipelineKey(batch=8, orig_h=480, orig_w=640, size=416,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    outs = {}
    for tag, env in (("pallas", None), ("jnp", "1")):
        if env is None:
            os.environ.pop("PYTORCH_YOLO_NO_PALLAS", None)
        else:
            os.environ["PYTORCH_YOLO_NO_PALLAS"] = env
        det = Detector.load("yolov4-tiny")
        res = det._pipeline(key)(det.params, dev)
        outs[tag] = [np.asarray(a) for a in
                     (res.boxes, res.obj, res.cls_id, res.valid)]
    os.environ.pop("PYTORCH_YOLO_NO_PALLAS", None)
    n_p = int(outs["pallas"][3].sum())
    n_j = int(outs["jnp"][3].sum())
    box_err = float(np.max(np.abs(outs["pallas"][0] - outs["jnp"][0]))) \
        if n_p == n_j else None
    cls_match = bool(np.array_equal(outs["pallas"][2], outs["jnp"][2])) \
        if n_p == n_j else False
    return {"n_pallas": n_p, "n_jnp": n_j, "box_max_abs": box_err,
            "cls_ids_equal": cls_match}

guard(2, "v4tiny_pallas_vs_jnp_fp32", v4tiny_pallas_vs_jnp)

guard(3, "v4tiny_bf16_b64",
      lambda: bench.measure_compute("yolov4-tiny", 416, 4 * B, ITERS,
                                    "bfloat16", "default"))

guard(4, "v4tiny_int8s_b64",
      lambda: bench.measure_compute("yolov4-tiny", 416, 4 * B, ITERS,
                                    "int8s", "default"))

guard(5, "v4_bf16_b16",
      lambda: bench.measure_compute("yolov4", 416, B, ITERS,
                                    "bfloat16", "default"))

guard(6, "v4_bf16_b64",
      lambda: bench.measure_compute("yolov4", 416, 4 * B, max(ITERS // 2, 5),
                                    "bfloat16", "default"))

guard(7, "v4_int8s_b64",
      lambda: bench.measure_compute("yolov4", 416, 4 * B, max(ITERS // 2, 5),
                                    "int8s", "default"))

guard(8, "v4_int8sb_b64",
      lambda: bench.measure_compute("yolov4", 416, 4 * B, max(ITERS // 2, 5),
                                    "int8sb", "default"))

guard(9, "control_yolov3_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 4 * B, max(ITERS // 2, 5),
                                    "bfloat16", "default"))

guard(10, "drift_v4tiny", lambda: bench.measure_drift("yolov4-tiny", 416,
                                                      n_imgs=2))

guard(11, "drift_v4", lambda: bench.measure_drift("yolov4", 416, n_imgs=2))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/v4_family_r3.jsonl",
                                  default_retries=5,
                                  default_retry_wait=120,
                                  default_timeout=2400))
