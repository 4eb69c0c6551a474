"""Scaled-YOLOv4 large (yolov4-p5 / yolov4-p6) TPU harvest (one acquisition).

Banks the first hardware evidence for the 4-anchor / stride-64 head
geometry (CPU-parity-tested in tests/test_new_coords.py):

  1. 4-anchor fused Pallas decode: exact-match vs jnp reference ON the TPU
     (340-channel head blocks have never compiled on real Mosaic),
  2. full-pipeline Pallas-vs-jnp A/B for yolov4-p5 (fp32, b4),
  3. compute-mode throughput: p5 @416 b32 + @896 b8; p6 @640 b8 (bf16),
  4. yolov3 bf16 b64 weather control (banked 1343.8 r3 / 1301 same-day),
  5. p5 serving drift (bf16 vs fp32/HIGHEST),
  6. yolov3 b192/b256 frontier rows,
  7. yolov4-p7 first hardware rows (@640 b8 + native @1536 b1, bf16),
  8. v4-family early-skip int8sb A/B (mish stems default to quantize-all;
     banked int8 rows lose to bf16 — does the stride<8 skip flip that?),
  9. int8sb noisy-skip throughput A/B (accuracy side CPU-measured:
     skip-top8 recovers agreement 0.894->0.936, perf/int8_attrib_cpu_r3
     — this pins its hardware speed cost vs plain int8sb).

  python tools/tpu_harvest_large.py [--retries 5] [--timeout 7200] \
      [--out perf/large_r3.jsonl]

Resume: HARVEST_SKIP_TO=<step> skips banked steps.  Single-tenant
landmines apply: ONE patient process, never probe/kill (CLAUDE.md).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
import jax.numpy as jnp

def pallas_4anchor_parity():
    from pytorch_yolo_tpu.ops.pallas_kernels import (decode_score_head,
                                                     decode_score_head_ref)

    anchors = ((13, 17), (31, 25), (24, 51), (61, 45))
    rng = np.random.default_rng(17)
    raw = jnp.asarray(rng.uniform(0.01, 0.99, (4, 13, 13, 340))
                      .astype(np.float32))
    kw = dict(cls_act="linear", scale_xy=2.0, new_coords=True)
    ours = np.asarray(decode_score_head(raw, anchors, 32, 80,
                                        interpret=False, **kw))
    ref = np.asarray(decode_score_head_ref(raw, anchors, 32, 80, **kw))
    return {"max_abs_err": float(np.max(np.abs(ours - ref))),
            "cls_ids_equal": bool((ours[..., 6] == ref[..., 6]).all())}

guard(1, "pallas_4anchor_parity", pallas_4anchor_parity)

def p5_pallas_vs_jnp():
    from pytorch_yolo_tpu.api import Detector, _PipelineKey

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (4, 480, 640, 3), dtype=np.uint8)
    dev = jax.device_put(imgs)
    key = _PipelineKey(batch=4, orig_h=480, orig_w=640, size=416,
                       conf=0.6, iou=0.45, max_det=300, bgr=True)
    outs = {}
    for tag, env in (("pallas", None), ("jnp", "1")):
        if env is None:
            os.environ.pop("PYTORCH_YOLO_NO_PALLAS", None)
        else:
            os.environ["PYTORCH_YOLO_NO_PALLAS"] = env
        det = Detector.load("yolov4-p5")
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

guard(2, "p5_pallas_vs_jnp_fp32", p5_pallas_vs_jnp)

guard(3, "p5_bf16_416_b32",
      lambda: bench.measure_compute("yolov4-p5", 416, 32, 10,
                                    "bfloat16", "default"))

guard(4, "p5_bf16_896_b8",
      lambda: bench.measure_compute("yolov4-p5", 896, 8, 10,
                                    "bfloat16", "default"))

guard(5, "p6_bf16_640_b8",
      lambda: bench.measure_compute("yolov4-p6", 640, 8, 10,
                                    "bfloat16", "default"))

guard(6, "control_yolov3_bf16_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "bfloat16", "default"))

guard(7, "drift_p5", lambda: bench.measure_drift("yolov4-p5", 416, n_imgs=2))

guard(8, "yolov3_bf16_b192",
      lambda: bench.measure_compute("yolov3", 416, 192, 10,
                                    "bfloat16", "default"))

guard(9, "yolov3_bf16_b256",
      lambda: bench.measure_compute("yolov3", 416, 256, 10,
                                    "bfloat16", "default"))

guard(10, "p7_bf16_640_b8",
      lambda: bench.measure_compute("yolov4-p7", 640, 8, 10,
                                    "bfloat16", "default"))

guard(11, "p7_bf16_1536_b1",
      lambda: bench.measure_compute("yolov4-p7", 1536, 1, 5,
                                    "bfloat16", "default"))

def _earlyskip(model):
    os.environ["PYTORCH_YOLO_INT8_EARLY_STRIDE"] = "8"
    try:
        return bench.measure_compute(model, 416, 64, 10, "int8sb", "default")
    finally:
        os.environ.pop("PYTORCH_YOLO_INT8_EARLY_STRIDE", None)

guard(12, "v4_int8sb_earlyskip_b64", lambda: _earlyskip("yolov4"))

guard(13, "csp_int8sb_earlyskip_b64", lambda: _earlyskip("yolov4-csp"))

guard(14, "yolov3_bf16_b64_chain1",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "bfloat16", "default"))

guard(15, "yolov3_bf16_b64_chain8",
      lambda: bench.measure_compute("yolov3", 416, 64, 5,
                                    "bfloat16", "default", chain=8))

guard(16, "yolov3_bf16_b128_chain8",
      lambda: bench.measure_compute("yolov3", 416, 128, 5,
                                    "bfloat16", "default", chain=8))

guard(17, "yolov3_int8sb_b128_chain8",
      lambda: bench.measure_compute("yolov3", 416, 128, 5,
                                    "int8sb", "default", chain=8))

guard(18, "p6_bf16_1280_b2",
      lambda: bench.measure_compute("yolov4-p6", 1280, 2, 5,
                                    "bfloat16", "default"))

guard(19, "yolov3_int8sb_b64_control",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "int8sb", "default"))

guard(20, "yolov3_int8sb_noisy8_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "int8sb", "default",
                                    quant_skip_noisy=8))

guard(21, "yolov3_int8sb_splitcat_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "int8sb", "default",
                                    quant_split_concat=True))

guard(22, "yolov3_int8sb_smooth_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "int8sb", "default",
                                    quant_smooth=0.5))

guard(23, "yolov3_w8_b64",
      lambda: bench.measure_compute("yolov3", 416, 64, 10,
                                    "w8", "default"))

guard(24, "yolov3_w8_b1_latency",
      lambda: bench.measure_compute("yolov3", 416, 1, 30,
                                    "w8", "default"))

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    # ~90 min of steps on a fresh cache (p7 native-1536 compile included):
    # the per-attempt watchdog must cover the WHOLE child run.
    raise SystemExit(harvest_main(CHILD, "perf/large_r3.jsonl",
                                  default_timeout=7200))
