"""yolov4-csp (Scaled-YOLOv4) TPU harvest (one acquisition, safe->risky).

The new_coords dialect + the yolov4-csp zoo model are parity-tested on
CPU; this child banks the hardware evidence:

  1. new_coords fused Pallas decode: exact-match vs the jnp reference ON
     the TPU (r2/r3 proofs covered sigmoid/exp decode only; the
     pre-activated branch has never compiled on real Mosaic),
  2. full-pipeline Pallas-vs-jnp A/B for yolov4-csp (fp32, b8),
  3. compute-mode throughput rows at b64: bf16 / int8s / int8sb,
  4. yolov3 bf16 weather controls at b64 AND at the new b128 bench
     default (banked: 1343.8 b64 / 1397 b128),
  5. serving drift (bf16 / int8 modes) vs fp32/HIGHEST.

  python tools/tpu_harvest_csp.py [--retries 5] [--timeout 3600] \
      [--out perf/csp_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps (persistent XLA compile
cache makes retried compiles cheap).  Single-tenant landmines apply: ONE
patient process, never probe/kill (CLAUDE.md).
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

def pallas_new_coords_parity():
    from pytorch_yolo_tpu.ops.pallas_kernels import (decode_score_head,
                                                     decode_score_head_ref)

    anchors = ((12, 16), (19, 36), (40, 28))
    rng = np.random.default_rng(31)
    # head outputs are post-logistic: everything lives in (0, 1)
    raw = jnp.asarray(rng.uniform(0.01, 0.99, (4, 13, 13, 255))
                      .astype(np.float32))
    kw = dict(cls_act="linear", scale_xy=2.0, new_coords=True)
    ours = np.asarray(decode_score_head(raw, anchors, 32, 80,
                                        interpret=False, **kw))
    ref = np.asarray(decode_score_head_ref(raw, anchors, 32, 80, **kw))
    return {"max_abs_err": float(np.max(np.abs(ours - ref))),
            "cls_ids_equal": bool((ours[..., 6] == ref[..., 6]).all())}

guard(1, "pallas_new_coords_parity", pallas_new_coords_parity)

def csp_pallas_vs_jnp():
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
        det = Detector.load("yolov4-csp")
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

guard(2, "csp_pallas_vs_jnp_fp32", csp_pallas_vs_jnp)

guard(3, "csp_bf16_b64",
      lambda: bench.measure_compute("yolov4-csp", 416, 4 * B,
                                    max(ITERS // 2, 5), "bfloat16", "default"))

guard(4, "csp_int8s_b64",
      lambda: bench.measure_compute("yolov4-csp", 416, 4 * B,
                                    max(ITERS // 2, 5), "int8s", "default"))

guard(5, "csp_int8sb_b64",
      lambda: bench.measure_compute("yolov4-csp", 416, 4 * B,
                                    max(ITERS // 2, 5), "int8sb", "default"))

guard(6, "control_yolov3_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 4 * B,
                                    max(ITERS // 2, 5), "bfloat16", "default"))

guard(7, "control_yolov3_bf16_b128",
      lambda: bench.measure_compute("yolov3", 416, 8 * B,
                                    max(ITERS // 2, 5), "bfloat16", "default"))

guard(8, "drift_csp", lambda: bench.measure_drift("yolov4-csp", 416,
                                                  n_imgs=2))

guard(9, "xmish_bf16_b32",
      lambda: bench.measure_compute("yolov4x-mish", 416, 2 * B,
                                    max(ITERS // 2, 5), "bfloat16", "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "perf/csp_r3.jsonl",
                                  default_timeout=3600))
