"""Per-conv int8 noise attribution + skip-set/calibration drift ladder (CPU).

Round-3 follow-through on the shipped int8sb serving mode: on hardware it
measures 0.918 post-NMS set agreement vs fp32/HIGHEST where pure bf16
measures 0.990 (perf/int8_serving_ab_r3.jsonl) — ~7 points bought by
activation quantization.  Which convs buy it, and can a refined default
skip set / calibration recover agreement at negligible FLOP cost?

Two parts, both CPU-only (the axon backend may be down; int8 math is exact
integer arithmetic on both backends and the glue is bf16-class on both, so
the *relative ordering* of configs transfers — absolute numbers get
re-pinned on TPU by the next harvest):

1. **Attribution.** Run the fp32/HIGHEST forward and the int8sb forward
   (static scales, bf16 glue, no S2D so layer indices align) with
   ``collect_conv_in_stats=identity``, giving every conv's input tensor in
   both modes.  Report (a) cumulative relative error per conv input and
   (b) *isolated* per-layer noise: ``quantized_conv`` vs the fp conv on the
   SAME fp32 input — upstream noise cancelled, the clean ranking signal.

2. **Drift ladder.** Candidate configs (default int8sb; +skip the top-K
   noisiest convs from part 1; percentile calibration) scored by
   ``measure_mode_drift`` set agreement on the same synthetic images, each
   with its statically-computed skipped-FLOP share (= speed-cost upper
   bound of skipping those convs).

Writes one JSON row per result to ``perf/int8_attrib_cpu_r3.jsonl``
(incremental — partial runs keep their rows).

Usage:  python tools/int8_attrib_cpu.py [--model yolov3] [--size 416]
            [--imgs 3] [--topk 4 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# CPU pinning landmine (CLAUDE.md): env var BEFORE importing jax, then the
# config update — neither alone reliably keeps a process off the tunnel.
# Hard-set (not setdefault): the container ships JAX_PLATFORMS=axon in the
# environment, and this tool must NEVER touch the single-tenant tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from pytorch_yolo_tpu.api import Detector  # noqa: E402
from pytorch_yolo_tpu.config import ConvSpec  # noqa: E402
from pytorch_yolo_tpu.models.darknet import _conv, build_forward  # noqa: E402
from pytorch_yolo_tpu.ops.preprocess import letterbox_host  # noqa: E402
from pytorch_yolo_tpu.ops.quant import (  # noqa: E402
    conv_input_strides,
    quantized_conv,
    resolve_skip_layers,
)
from pytorch_yolo_tpu.utils.drift import measure_mode_drift  # noqa: E402


def emit(out_path: str, **row) -> None:
    row_json = json.dumps(row)
    print(row_json, flush=True)
    with open(out_path, "a") as f:
        f.write(row_json + "\n")


def rel_l2(a: np.ndarray, b: np.ndarray) -> float:
    denom = float(np.linalg.norm(b.ravel())) or 1.0
    return float(np.linalg.norm((a - b).ravel())) / denom


def conv_flops(spec, params, size: int) -> dict[int, float]:
    """Static FLOPs per conv at a square input size (2*MACs)."""
    strides = conv_input_strides(spec)
    flops: dict[int, float] = {}
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec):
            continue
        p = params[layer.index]
        w = p["w"] if "w" in p else p["wq"]
        kh, kw, cin, cout = w.shape
        out_sp = (size // (strides[layer.index] * layer.stride)) ** 2
        flops[layer.index] = 2.0 * out_sp * kh * kw * cin * cout
    return flops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--imgs", type=int, default=3)
    ap.add_argument("--topk", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--configs", nargs="*", default=None,
                    help="run only these ladder configs (resume a partial "
                         "run without redoing ~8-min drift rows, e.g. "
                         "--configs int8sb+p99.9)")
    ap.add_argument("--out", default="perf/int8_attrib_cpu_r3.jsonl")
    args = ap.parse_args()

    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            for _ in range(args.imgs)]

    ref = Detector.load(args.model)  # synthetic weights, fp32/HIGHEST
    spec = ref.spec
    host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
            for k, v in ref.params.items()}
    emit(args.out, step="setup", model=args.model, size=args.size,
         backend=jax.default_backend(), n_imgs=args.imgs)

    # ---- part 1: attribution ------------------------------------------------
    # int8sb params via the production construction path; stem_s2d=False so
    # conv indices align with the fp32 forward (S2D is an exact reparam of
    # layers 0/1, not part of the quantization question).
    det_q = Detector(spec, host, compute_dtype=jnp.bfloat16,
                     precision="default", quant="w8a8",
                     quant_calib=imgs[:2], quant_recipe="none", stem_s2d=False)
    qparams = det_q.params
    quantized = sorted(i for i, p in qparams.items() if "wq" in p)
    emit(args.out, step="quantized_set", n_quantized=len(quantized),
         skipped=sorted(int(i) for i in det_q._quant_skip))

    need_ranking = args.configs is None or any(
        "skip-top" in c for c in args.configs)
    ranked: list[dict] = []
    if not need_ranking:
        emit(args.out, step="attribution_skipped",
             reason="--configs needs no skip-topK ranking")

    x, _ = letterbox_host(imgs[0], args.size)
    x = jnp.asarray(x[None])

    if need_ranking:
        ident = lambda i, t: t  # noqa: E731
        fwd_fp = jax.jit(build_forward(spec, collect_conv_in_stats=ident))
        _, stats_fp = fwd_fp(host, x)
        stats_fp = {i: np.asarray(v, np.float32) for i, v in stats_fp.items()}

        fwd_q = jax.jit(build_forward(spec, compute_dtype=jnp.bfloat16,
                                      precision="default", quant="w8a8",
                                      collect_conv_in_stats=ident))
        _, stats_q = fwd_q(qparams, x)

        rows = []
        for idx in sorted(stats_fp):
            xq = np.asarray(stats_q[idx])
            if xq.dtype == np.int8:  # int8-resident chain input: dequantize
                xq = xq.astype(np.float32) * float(
                    np.asarray(qparams[idx]["sa"]))
            else:
                xq = xq.astype(np.float32)
            cum = rel_l2(xq, stats_fp[idx])

            # isolated single-layer noise: quantized vs fp conv on the SAME
            # fp32 input — upstream noise cancelled.
            iso = None
            p = qparams[idx]
            layer = spec.layers[idx]
            if "wq" in p:
                y_fp = np.asarray(_conv(jnp.asarray(stats_fp[idx]),
                                        jnp.asarray(host[idx]["w"]),
                                        jnp.asarray(host[idx]["b"]),
                                        layer, jnp.float32,
                                        jax.lax.Precision.HIGHEST))
                y_q = np.asarray(quantized_conv(
                    jnp.asarray(stats_fp[idx]), p["wq"], p["ws"], p["b"],
                    layer, sx=p.get("sa")), np.float32)
                iso = rel_l2(y_q, y_fp)
            rows.append({"conv": int(idx), "cum_rel_err": round(cum, 5),
                         "iso_rel_err": None if iso is None else round(iso, 5),
                         "quantized": "wq" in p})
        emit(args.out, step="attribution", rows=rows)

        ranked = sorted((r for r in rows if r["iso_rel_err"] is not None),
                        key=lambda r: -r["iso_rel_err"])
        emit(args.out, step="iso_ranking",
             worst=[(r["conv"], r["iso_rel_err"]) for r in ranked[:12]])

    # ---- part 2: drift ladder ----------------------------------------------
    flops = conv_flops(spec, host, args.size)
    total_flops = sum(flops.values())
    base_skip = frozenset(int(i) for i in det_q._quant_skip)
    base_cost = sum(flops[i] for i in base_skip if i in flops) / total_flops

    def cfg_skip(extra: frozenset) -> dict:
        sk = base_skip | extra
        return {"quant_skip_layers": sk,
                "skip_flop_share": round(
                    sum(flops[i] for i in sk if i in flops) / total_flops, 4)}

    ladder: list[tuple[str, dict]] = [
        ("bf16", {"compute_dtype": jnp.bfloat16, "precision": "default"}),
        # weight-only int8 (no activation quant): expect bf16-class
        # agreement — the memory-bound serving mode's accuracy bound
        ("w8bf16", {"compute_dtype": jnp.bfloat16, "precision": "default",
                    "quant": "w8"}),
        ("int8sb-default", {"compute_dtype": jnp.bfloat16,
                            "precision": "default", "quant": "w8a8",
                            "quant_calib": imgs[:2],
                            "skip_flop_share": round(base_cost, 4)}),
    ]
    for k in args.topk:
        extra = frozenset(r["conv"] for r in ranked[:k])
        kw = cfg_skip(extra)
        kw.update(compute_dtype=jnp.bfloat16, precision="default",
                  quant="w8a8", quant_calib=imgs[:2], quant_recipe="none")
        ladder.append((f"int8sb+skip-top{k}", kw))
    ladder.append(("int8sb+p99.9", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_calib_percentile": 99.9,
        "skip_flop_share": round(base_cost, 4)}))
    # combined: outlier-robust scales AND the noisiest convs kept fp —
    # are the two recoveries additive?
    for k in args.topk:
        extra = frozenset(r["conv"] for r in ranked[:k])
        kw = cfg_skip(extra)
        kw.update(compute_dtype=jnp.bfloat16, precision="default",
                  quant="w8a8", quant_calib=imgs[:2],
                  quant_calib_percentile=99.9)
        ladder.append((f"int8sb+p99.9+skip-top{k}", kw))
    # split-concat: per-branch scales for route-concat convs (the measured
    # worst offenders) at ZERO skipped FLOPs — ops/quant.quantized_conv
    # split path.
    ladder.append(("int8sb+splitcat", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_split_concat": True,
        "skip_flop_share": round(base_cost, 4)}))
    # per-channel smoothing (SmoothQuant-style): every conv gets a
    # per-input-channel grid folded into its kernels — zero runtime FLOPs.
    for alpha in (0.5, 0.75):
        ladder.append((f"int8sb+smooth{alpha}", {
            "compute_dtype": jnp.bfloat16, "precision": "default",
            "quant": "w8a8", "quant_calib": imgs[:2],
            "quant_smooth": alpha,
            "skip_flop_share": round(base_cost, 4)}))
    # smoothing + skip-noisy compose (different mechanisms: per-channel
    # grids fix concat bimodality, the skip removes residual worst convs;
    # Detector re-ranks under the smoothed policy internally).
    ladder.append(("int8sb+smooth0.5+noisy4", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_smooth": 0.5, "quant_skip_noisy": 4,
        "skip_flop_share": None}))  # resolved skip set is data-dependent
    # DFQ-style bias correction: mean pre-activation quantization error
    # absorbed into each conv bias at calibration — zero runtime cost.
    ladder.append(("int8sb+bc", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_bias_correct": True,
        "skip_flop_share": round(base_cost, 4)}))
    ladder.append(("int8sb+smooth0.5+bc", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_smooth": 0.5, "quant_bias_correct": True,
        "skip_flop_share": round(base_cost, 4)}))
    # percentile x smooth: with percentile set, the per-channel stats the
    # grid builds on are per-channel percentiles — outlier-robust grids.
    ladder.append(("int8sb+p99.9+smooth0.5", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_calib_percentile": 99.9, "quant_smooth": 0.5,
        "skip_flop_share": round(base_cost, 4)}))
    ladder.append(("int8sb+p99.9+smooth0.5+bc", {
        "compute_dtype": jnp.bfloat16, "precision": "default",
        "quant": "w8a8", "quant_calib": imgs[:2],
        "quant_calib_percentile": 99.9, "quant_smooth": 0.5,
        "quant_bias_correct": True,
        "skip_flop_share": round(base_cost, 4)}))

    for name, kw in ladder:
        if args.configs is not None and name not in args.configs:
            continue
        share = kw.pop("skip_flop_share", None)
        t1 = time.perf_counter()
        det = Detector(spec, host, **kw)
        if share is None and det._quant_skip:
            # data-dependent skip set (quant_skip_noisy): read it back
            share = round(sum(flops[i] for i in det._quant_skip
                              if i in flops) / total_flops, 4)
        s = measure_mode_drift(ref, det, imgs, size=args.size)
        emit(args.out, step="drift", config=name,
             set_agreement=round(s.set_agreement, 4),
             box_p99_px=round(s.box_p99_px, 3),
             score_p99=round(s.score_p99, 5),
             skip_flop_share=share,
             seconds=round(time.perf_counter() - t1, 1))

    emit(args.out, step="done", total_s=round(time.perf_counter() - t0, 1))


if __name__ == "__main__":
    main()
