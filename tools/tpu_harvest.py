"""One-acquisition TPU measurement harvest.

Device acquisition on the tunneled single-tenant axon TPU is the scarce
resource (grants don't queue — CLAUDE.md landmines), so this tool harvests
EVERYTHING in one ordered session, emitting one JSON line per banked result
so a late wedge cannot lose earlier evidence:

  1. headline: fp32/HIGHEST e2e, unfused XLA decode/NMS (safest compiles)
  2. serving modes e2e: fp32/HIGH, bf16, int8 (still unfused)
  3. multires 320/416/608, pipelined stream FPS, H2D table, drift rows
  4. RISKY LAST: Pallas kernel proof (tiny shapes), fused e2e compare
  5. pipeline + per-stage profiles

The persistent XLA compile cache is enabled, so a retried session (fresh
child) skips every compile the previous attempt finished — retries converge.

  python tools/tpu_harvest.py [--retries 8] [--timeout 1500] \
      [--out /tmp/tpu_harvest.jsonl]

Parent exit: 0 if the child reached "done", else non-zero.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from harvest_common import CHILD_PRELUDE

CHILD = CHILD_PRELUDE + r"""
MODEL = os.environ.get("HARVEST_MODEL", "yolov3")

ITERS = int(os.environ.get("HARVEST_ITERS", "20"))

B = int(os.environ.get("HARVEST_BATCH", "16"))

os.environ["PYTORCH_YOLO_NO_PALLAS"] = "1"

guard(1, "headline_fp32_highest_unfused",
      lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "float32", "highest"))

guard(2, "e2e_fp32_high", lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "float32", "high"))

guard(3, "e2e_bf16", lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "bfloat16", "default"))

guard(4, "e2e_int8", lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "int8", "default"))

guard(5, "e2e_bf16_b32", lambda: bench.measure_tpu(MODEL, 416, 2 * B, ITERS, 2, "bfloat16", "default"))

guard(6, "multires_bf16", lambda: bench.measure_multires(MODEL, max(ITERS // 3, 2), "bfloat16", "default"))

guard(7, "stream_fp32_highest", lambda: bench.measure_stream(MODEL, 2 * ITERS, "float32", "highest"))

guard(8, "stream_bf16", lambda: bench.measure_stream(MODEL, 2 * ITERS, "bfloat16", "default"))

guard(9, "h2d", lambda: bench.measure_h2d())

guard(10, "drift", lambda: bench.measure_drift(MODEL, 416, n_imgs=2))

del os.environ["PYTORCH_YOLO_NO_PALLAS"]

def pallas_proof():
    from pytorch_yolo_tpu.ops.pallas_kernels import (
        decode_score_head, decode_score_head_ref, nms_keep_pallas)
    from pytorch_yolo_tpu.ops.nms import greedy_suppress, iou_matrix
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    anchors = ((116.0, 90.0), (156.0, 198.0), (373.0, 326.0))
    raw = jnp.asarray(rng.normal(size=(1, 4, 4, 255)).astype(np.float32))
    got = np.asarray(decode_score_head(raw, anchors, 32, 80, interpret=False))
    want = np.asarray(decode_score_head_ref(raw, anchors, 32, 80))
    decode_err = float(np.abs(got - want).max())
    k = 300
    boxes = rng.uniform(0, 416, size=(2, k, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(4, 120, size=(2, k, 2)).astype(np.float32)
    score = np.sort(rng.uniform(0.05, 1.0, size=(2, k)).astype(np.float32))[:, ::-1]
    valid = score > 0.1
    cls = rng.integers(0, 5, size=(2, k)).astype(np.float32)
    keep = np.asarray(nms_keep_pallas(jnp.asarray(boxes), jnp.asarray(valid),
                                      0.45, cls_id=jnp.asarray(cls),
                                      interpret=False))
    ok = True
    for i in range(2):
        iou = np.asarray(iou_matrix(jnp.asarray(boxes[i])))
        iou = iou * (cls[i][:, None] == cls[i][None, :])
        ref = np.asarray(greedy_suppress(jnp.asarray(iou), jnp.asarray(valid[i]), 0.45))
        ok = ok and bool((keep[i] == ref).all())
    return {"decode_max_err": decode_err, "decode_ok": decode_err < 1e-3,
            "nms_keepset_ok": ok}

guard(11, "pallas_proof_tiny", pallas_proof)

guard(12, "e2e_fused_fp32_highest",
      lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "float32", "highest"))

guard(13, "e2e_fused_bf16",
      lambda: bench.measure_tpu(MODEL, 416, B, ITERS, 2, "bfloat16", "default"))

def profiles(use_pallas):
    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.utils.profiling import profile_pipeline
    det = Detector.load(MODEL, use_pallas=use_pallas)
    return profile_pipeline(det, size=416, batch=B, iters=max(ITERS // 3, 2))

guard(14, "pipeline_profile_unfused", lambda: profiles(False))

guard(15, "pipeline_profile_fused", lambda: profiles(True))

def stage_profile():
    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.utils.profiling import profile_stages
    import jax.numpy as jnp
    det = Detector.load(MODEL, compute_dtype=jnp.bfloat16, precision="default")
    return profile_stages(det, size=416, batch=B, iters=max(ITERS // 4, 2))

guard(16, "stage_profile_bf16", stage_profile)

guard(17, "pipelined_u8_fp32_highest",
      lambda: bench.measure_tpu_pipelined(MODEL, 416, B, ITERS, "float32", "highest"))

guard(18, "pipelined_u8_bf16",
      lambda: bench.measure_tpu_pipelined(MODEL, 416, B, ITERS, "bfloat16", "default"))

guard(19, "pipelined_u8_int8",
      lambda: bench.measure_tpu_pipelined(MODEL, 416, B, ITERS, "int8", "default"))

guard(20, "compute_fp32_highest",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "float32", "highest"))

guard(21, "compute_bf16",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "bfloat16", "default"))

guard(22, "compute_bf16_b32",
      lambda: bench.measure_compute(MODEL, 416, 2 * B, ITERS, "bfloat16", "default"))

guard(23, "compute_bf16_b64",
      lambda: bench.measure_compute(MODEL, 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

guard(24, "compute_int8",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "int8", "default"))

def stream_u8():
    from pytorch_yolo_tpu.api import Detector
    import jax.numpy as jnp
    det = Detector.load(MODEL, compute_dtype=jnp.bfloat16, precision="default")
    frame = np.random.default_rng(0).integers(0, 256, size=(480, 640, 3), dtype=np.uint8)
    kw = dict(size=416, conf=0.6, host_preproc=True, transfer="u8", depth=3)
    for _ in det.detect_stream(iter([frame, frame]), **kw):
        pass
    t0 = time.perf_counter()
    n = 0
    for _ in det.detect_stream(iter([frame] * (2 * ITERS)), **kw):
        n += 1
    return n / (time.perf_counter() - t0)

guard(25, "stream_u8_bf16", stream_u8)

os.environ["PYTORCH_YOLO_STEM_S2D"] = "1"

guard(27, "compute_bf16_s2d",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "bfloat16", "default"))

guard(28, "compute_bf16_b64_s2d",
      lambda: bench.measure_compute(MODEL, 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

guard(29, "compute_fp32_highest_s2d",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "float32", "highest"))

guard(30, "stage_profile_bf16_s2d", stage_profile)

del os.environ["PYTORCH_YOLO_STEM_S2D"]

guard(31, "pallas_proof_fixpoint", pallas_proof)

guard(32, "pipeline_profile_fixpoint_fused", lambda: profiles(True))

guard(33, "pipeline_profile_fixpoint_unfused", lambda: profiles(False))

guard(34, "compute_bf16_final",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "bfloat16", "default"))

guard(35, "compute_bf16_b64_final",
      lambda: bench.measure_compute(MODEL, 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

guard(36, "compute_fp32_highest_final",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "float32", "highest"))

guard(37, "compute_fp32_high",  # measured bit-identical to HIGHEST on TPU
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "float32", "high"))

guard(38, "compute_bf16_b128",
      lambda: bench.measure_compute(MODEL, 416, 8 * B, max(ITERS // 4, 5), "bfloat16", "default"))

guard(39, "compute_bf16_b1_latency",
      lambda: bench.measure_compute(MODEL, 416, 1, 3 * ITERS, "bfloat16", "default"))

guard(40, "tiny_compute_bf16_b64",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS, "bfloat16", "default"))

guard(41, "tiny_compute_fp32_highest_b64",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS, "float32", "highest"))

guard(42, "spp_compute_bf16_b64",
      lambda: bench.measure_compute("yolov3-spp", 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

guard(43, "v2_compute_bf16_b64",
      lambda: bench.measure_compute("yolov2", 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

guard(44, "drift_serving_defaults",
      lambda: bench.measure_drift(MODEL, 416, n_imgs=2))

os.environ["PYTORCH_YOLO_STEM_S2D"] = "1"

guard(45, "tiny_compute_bf16_b64_s2d",
      lambda: bench.measure_compute("yolov3-tiny", 416, 4 * B, ITERS, "bfloat16", "default"))

guard(46, "v2_compute_bf16_b64_s2d",
      lambda: bench.measure_compute("yolov2", 416, 4 * B, max(ITERS // 2, 5), "bfloat16", "default"))

del os.environ["PYTORCH_YOLO_STEM_S2D"]

guard(47, "compute_int8_static_b16",
      lambda: bench.measure_compute(MODEL, 416, B, ITERS, "int8s", "default"))

guard(48, "compute_int8_static_b64",
      lambda: bench.measure_compute(MODEL, 416, 4 * B, max(ITERS // 2, 5), "int8s", "default"))

guard(49, "drift_with_int8_static",
      lambda: bench.measure_drift(MODEL, 416, n_imgs=2))

os.environ["PYTORCH_YOLO_NO_PALLAS"] = "1"

guard(50, "v2tiny_compute_bf16_b64_nopallas",  # completes the model-zoo table
      lambda: bench.measure_compute("yolov2-tiny", 416, 4 * B, ITERS, "bfloat16", "default"))

del os.environ["PYTORCH_YOLO_NO_PALLAS"]

def fine_profile():
    import jax.numpy as jnp
    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.config import ConvSpec
    from pytorch_yolo_tpu.utils.profiling import profile_stages

    det = Detector.load(MODEL, compute_dtype=jnp.bfloat16, precision="default")
    convs = [l.index for l in det.spec.layers if isinstance(l, ConvSpec)]
    cuts = convs[::2] + ([convs[-1]] if convs[-1] not in convs[::2] else [])
    out = []
    for idx in cuts:
        row = profile_stages(det, size=416, batch=B, iters=4,
                             cuts=[(idx, f"conv{idx}")])[0]
        emit(step="fine_profile_cut", layer=idx, cum_ms=row["cum_ms"])
        out.append({"layer": idx, "cum_ms": row["cum_ms"]})
    return out

guard(51, "fine_profile_bf16", fine_profile)

def stem_micro():
    import jax
    import jax.numpy as jnp
    from pytorch_yolo_tpu.models.darknet import (
        _conv, _pack_s2d_conv0, _space_to_depth)
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.weights import fold_batchnorm, random_raw_params

    spec = model_spec(MODEL)
    params = jax.tree_util.tree_map(
        jnp.asarray, fold_batchnorm(spec, random_raw_params(spec, seed=0)))
    x = jax.device_put(np.random.default_rng(0).random(
        (B, 416, 416, 3)).astype(np.float32))

    def timed(name, fn):
        jf = jax.jit(fn)
        np.asarray(jf(x))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(20):
            out = jf(x)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        emit(step="stem_micro", name=name, ms_per_batch=round(ms, 3))
        return ms

    rows = {}
    rows["noop_sum"] = timed("noop_sum", lambda xx: xx.sum())  # call floor
    rows["s2d_only"] = timed(
        "s2d_only", lambda xx: _space_to_depth(xx).astype(jnp.bfloat16).sum())
    rows["conv0_natural"] = timed(
        "conv0_natural",
        lambda xx: _conv(xx, params[0]["w"], params[0]["b"], spec.layers[0],
                         jnp.bfloat16, jax.lax.Precision.DEFAULT).sum())

    def packed0(xx):
        pw0, pb0 = _pack_s2d_conv0(params[0]["w"], params[0]["b"])
        y = jax.lax.conv_general_dilated(
            _space_to_depth(xx).astype(jnp.bfloat16),
            pw0.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.sum()

    rows["s2d_plus_packed_conv0"] = timed("s2d_plus_packed_conv0", packed0)
    return rows

guard(52, "stem_micro_bf16", stem_micro)

def conv_shapes():
    import jax
    import jax.numpy as jnp

    # (label, H=W, Cin, Cout, k, stride) — the distinct shapes that carry
    # Darknet-53's FLOPs (SURVEY.md §3.3 ledger), serving batch.
    shapes = [
        ("s2 208->104 64->128 k3", 208, 64, 128, 3, 2),
        ("104 128->64 k1", 104, 128, 64, 1, 1),
        ("104 64->128 k3", 104, 64, 128, 3, 1),
        ("52 256->128 k1", 52, 256, 128, 1, 1),
        ("52 128->256 k3", 52, 128, 256, 3, 1),
        ("26 512->256 k1", 26, 512, 256, 1, 1),
        ("26 256->512 k3", 26, 256, 512, 3, 1),
        ("13 1024->512 k1", 13, 1024, 512, 1, 1),
        ("13 512->1024 k3", 13, 512, 1024, 3, 1),
    ]
    rng = np.random.default_rng(0)
    rows = []
    for label, hw, cin, cout, k, st in shapes:
        x = jax.device_put(rng.random((B, hw, hw, cin)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        w = jax.device_put(rng.normal(size=(k, k, cin, cout)).astype(
            np.float32) * 0.05).astype(jnp.bfloat16)

        def f(xx, ww):
            return jax.lax.conv_general_dilated(
                xx, ww, (st, st), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).sum()

        jf = jax.jit(f)
        np.asarray(jf(x, w))
        t0 = time.perf_counter()
        for _ in range(30):
            out = jf(x, w)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / 30 * 1e3
        out_hw = hw // st
        flops = 2 * B * out_hw * out_hw * cout * k * k * cin
        tflops = flops / (ms / 1e3) / 1e12
        emit(step="conv_shape", label=label, ms=round(ms, 3),
             tflops=round(tflops, 1), mxu_pct=round(100 * tflops / 197, 1))  # v5e bf16 peak
        rows.append({"label": label, "ms": round(ms, 3),
                     "tflops": round(tflops, 1)})
    return rows

guard(53, "conv_shape_efficiency", conv_shapes)

def residual_pairs():
    import jax
    import jax.numpy as jnp
    from jax import lax

    pairs = [  # (label, HW, C_wide, C_narrow, repeats in darknet53)
        ("104 128<->64", 104, 128, 64, 2),
        ("52 256<->128", 52, 256, 128, 8),
        ("26 512<->256", 26, 512, 256, 8),
        ("13 1024<->512", 13, 1024, 512, 4),
    ]
    rng = np.random.default_rng(0)
    rows = []
    REPS = 20
    for label, hw, cw, cn, ndark in pairs:
        x = jax.device_put(rng.random((B, hw, hw, cw)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(1, 1, cw, cn)).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(size=(3, 3, cn, cw)).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)

        def f(xx, a=w1, b=w3):
            def body(_, y):
                t = lax.conv_general_dilated(
                    y, a, (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                t = lax.conv_general_dilated(
                    t, b, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return t
            return lax.fori_loop(0, REPS, body, xx).sum()

        jf = jax.jit(f)
        np.asarray(jf(x))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(x)
        np.asarray(out)
        call_ms = (time.perf_counter() - t0) / 5 * 1e3
        pair_ms = call_ms / REPS  # floor amortized over 20 pairs
        flops = 2 * B * hw * hw * (cw * cn + 9 * cn * cw)
        tflops = flops / (pair_ms / 1e3) / 1e12
        emit(step="residual_pair", label=label, pair_ms=round(pair_ms, 4),
             tflops=round(tflops, 1), mxu_pct=round(100 * tflops / 197, 1),  # v5e bf16 peak
             darknet_total_ms=round(pair_ms * ndark, 3))
        rows.append({"label": label, "pair_ms": round(pair_ms, 4),
                     "tflops": round(tflops, 1)})
    return rows

guard(54, "residual_pair_efficiency", residual_pairs)

def conv_vs_dot():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    rows = []
    REPS = 20
    for label, hw, cw, cn in (("13 1024<->512", 13, 1024, 512),
                              ("52 256<->128", 52, 256, 128)):
        x = jax.device_put(rng.random((B, hw, hw, cw)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(cw, cn)).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)
        w3 = jnp.asarray(rng.normal(size=(3, 3, cn, cw)).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)
        pair_flops = 2 * B * hw * hw * (cw * cn + 9 * cn * cw)

        def conv_pair(xx):
            def body(_, y):
                t = lax.conv_general_dilated(
                    y, w1[None, None], (1, 1), ((0, 0), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                return lax.conv_general_dilated(
                    t, w3, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return lax.fori_loop(0, REPS, body, xx).sum()

        def dot1_pair(xx):
            def body(_, y):
                n_, h_, w_, c_ = y.shape
                t = jnp.dot(y.reshape(-1, c_), w1,
                            preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16).reshape(n_, h_, w_, -1)
                return lax.conv_general_dilated(
                    t, w3, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return lax.fori_loop(0, REPS, body, xx).sum()

        m = B * hw * hw
        a0 = jax.device_put(rng.random((m, cw)).astype(np.float32)
                            ).astype(jnp.bfloat16)
        wq = jnp.asarray(rng.normal(size=(cn, cw)).astype(np.float32)
                         * 0.05).astype(jnp.bfloat16)

        def gemm_chain(aa):
            def body(_, y):
                t = jnp.dot(y, w1, preferred_element_type=jnp.float32
                            ).astype(jnp.bfloat16)          # (m,cw)@(cw,cn)
                return jnp.dot(t, wq, preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)       # back to (m,cw)
            return lax.fori_loop(0, REPS, body, aa).sum()

        gemm_flops = 2 * m * (cw * cn + cn * cw)

        for name, fn, fl, arg in (("conv_pair", conv_pair, pair_flops, x),
                                  ("dot1x1_pair", dot1_pair, pair_flops, x),
                                  ("gemm_chain", gemm_chain, gemm_flops, a0)):
            jf = jax.jit(fn)
            np.asarray(jf(arg))
            t0 = time.perf_counter()
            for _ in range(5):
                out = jf(arg)
            np.asarray(out)
            per = (time.perf_counter() - t0) / 5 / REPS * 1e3
            tf = fl / (per / 1e3) / 1e12
            emit(step="conv_vs_dot", shape=label, variant=name,
                 ms=round(per, 4), tflops=round(tf, 1),
                 mxu_pct=round(100 * tf / 197, 1))  # v5e bf16 peak
            rows.append({"shape": label, "variant": name,
                         "tflops": round(tf, 1)})
    return rows

guard(55, "conv_vs_dot", conv_vs_dot)

def loop_control():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    hw, cw, cn = 13, 1024, 512
    x = jax.device_put(rng.random((B, hw, hw, cw)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(1, 1, cw, cn)).astype(np.float32)
                     * 0.05).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(3, 3, cn, cw)).astype(np.float32)
                     * 0.05).astype(jnp.bfloat16)

    def pair(y):
        t = lax.conv_general_dilated(
            y, w1, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return lax.conv_general_dilated(
            t, w3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    rows = []

    def timed(name, fn, reps):
        jf = jax.jit(fn)
        np.asarray(jf(x))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(x)
        np.asarray(out)
        per = (time.perf_counter() - t0) / 5 / reps * 1e3
        emit(step="loop_control", variant=name, reps=reps,
             per_pair_ms=round(per, 4))
        rows.append({"variant": name, "reps": reps, "per_pair_ms": round(per, 4)})

    for reps in (5, 20, 80):
        timed("fori", lambda xx, r=reps: lax.fori_loop(
            0, r, lambda _, y: pair(y), xx).sum(), reps)

    def unrolled(xx):
        y = xx
        for _ in range(20):
            y = pair(y)
        return y.sum()

    timed("unrolled", unrolled, 20)
    return rows

guard(56, "loop_overhead_control", loop_control)

def int8_pairs():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    rows = []
    REPS = 80
    for label, hw, cw, cn in (("13 1024<->512", 13, 1024, 512),
                              ("52 256<->128", 52, 256, 128)):
        xq = jax.device_put(rng.integers(-127, 128, (B, hw, hw, cw)
                                         ).astype(np.int8))
        w1 = jnp.asarray(rng.integers(-127, 128, (1, 1, cw, cn)
                                      ).astype(np.int8))
        w3 = jnp.asarray(rng.integers(-127, 128, (3, 3, cn, cw)
                                      ).astype(np.int8))

        def pair_int8(y):
            a = lax.conv_general_dilated(
                y, w1, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            f = a.astype(jnp.float32) * 1e-4           # static rescale
            f = jnp.where(f > 0, f, 0.1 * f)           # leaky
            t = jnp.clip(jnp.round(f / 1e-2), -127, 127).astype(jnp.int8)
            a = lax.conv_general_dilated(
                t, w3, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            f = a.astype(jnp.float32) * 1e-4
            f = jnp.where(f > 0, f, 0.1 * f)
            return jnp.clip(jnp.round(f / 1e-2), -127, 127).astype(jnp.int8)

        jf = jax.jit(lambda xx: lax.fori_loop(
            0, REPS, lambda _, y: pair_int8(y), xx).astype(jnp.int32).sum())
        np.asarray(jf(xq))
        t0 = time.perf_counter()
        for _ in range(5):
            out = jf(xq)
        np.asarray(out)
        per = (time.perf_counter() - t0) / 5 / REPS * 1e3
        flops = 2 * B * hw * hw * (cw * cn + 9 * cn * cw)
        tops = flops / (per / 1e3) / 1e12
        emit(step="int8_pair", label=label, pair_ms=round(per, 4),
             tops=round(tops, 1), int8_peak_pct=round(100 * tops / 394, 1))
        rows.append({"label": label, "pair_ms": round(per, 4),
                     "tops": round(tops, 1)})
    return rows

guard(57, "int8_pair_efficiency", int8_pairs)

emit(step="done", total_s=round(time.perf_counter() - t_session, 1))
"""


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from harvest_common import harvest_main

    raise SystemExit(harvest_main(CHILD, "/tmp/tpu_harvest.jsonl",
                                  default_retries=8,
                                  default_retry_wait=120,
                                  default_timeout=1500))
