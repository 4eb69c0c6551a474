"""Command-line entry points: image/directory detection and video/webcam.

Replaces the reference's ``detect.py`` / ``video_demo.py`` / ``cam_demo.py``
(SURVEY.md §2.1 #9-10, §1 L6) with one argparse CLI:

    python -m pytorch_yolo_tpu.cli detect --images dog.jpg --model yolov3 \\
        --weights yolov3.weights --reso 416 --det out/
    python -m pytorch_yolo_tpu.cli video --source clip.mp4 --model yolov3-tiny
    python -m pytorch_yolo_tpu.cli video --source 0            # webcam

Flag names mirror the reference CLI (--confidence, --nms_thresh, --reso,
SURVEY.md §5.6a).  ``--profile`` wraps the run in ``jax.profiler.trace`` for a
Perfetto timeline (SURVEY.md §5.1).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import logging
import os
import sys
import time

import numpy as np

from .api import Detector
from .utils.draw import draw_detections
from .utils.profiling import PipelineStats

log = logging.getLogger("pytorch_yolo_tpu")

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model", default=None,
                   help="zoo model name (yolov3, yolov3-tiny)")
    p.add_argument("--cfg", default=None, help="Darknet .cfg path")
    p.add_argument("--weights", default=None, help="Darknet .weights path")
    p.add_argument("--names", default=None, help=".names file (default COCO-80)")
    p.add_argument("--confidence", type=float, default=0.5)
    p.add_argument("--nms_thresh", type=float, default=0.4)
    p.add_argument("--reso", type=_parse_reso, default=416,
                   help="network input resolution: square (416) or "
                        "rectangular HxW (256x416, widescreen video); "
                        "reference trio 320/416/608; each dim must be a "
                        "multiple of the model's deepest stride — 64 for "
                        "yolov4-p6, 128 for yolov4-p7, 32 otherwise")
    p.add_argument("--max_det", type=int, default=300)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (MXU speed mode, not bit-faithful)")
    p.add_argument("--int8", action="store_true",
                   help="W8A8 int8 convs (2x MXU rate on v5e; dynamic "
                        "activation scales unless --int8-calib is given). "
                        "Combine with --bf16 for the measured-fastest "
                        "yolov3 serving mode (int8 core + bf16 glue, "
                        "+19%% over bf16 alone at b64)")
    p.add_argument("--int8-skip-heads", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="keep the detection-head output convs in fp under "
                        "--int8 (default on: quantizing them is the classic "
                        "mAP-killer)")
    p.add_argument("--int8-calib", default=None, metavar="DIR",
                   help="calibrate static activation scales from images in "
                        "DIR (up to 8) — removes the per-conv dynamic "
                        "reductions; measured 2x int8 throughput at equal-"
                        "or-better drift (PERF.md round 2)")
    p.add_argument("--int8-calib-margin", type=float, default=1.0,
                   metavar="M",
                   help="multiply calibrated activation ranges by M (>1 "
                        "leaves headroom for activations beyond the "
                        "calibration set; out-of-range values saturate)")
    p.add_argument("--int8-calib-percentile", type=float, default=None,
                   metavar="Q",
                   help="calibrate from the Q-th percentile of |activation| "
                        "(e.g. 99.9) instead of the max — robust to outlier "
                        "activations in the calibration images")
    p.add_argument("--int8-skip-noisy", type=int, default=0, metavar="K",
                   help="with --int8-calib: rank every quantized conv's "
                        "isolated int8 noise on the calibration images and "
                        "keep the K noisiest in fp (measured on yolov3: "
                        "K=8 recovers post-NMS agreement 0.894->0.936 for "
                        "~9 pts of skipped FLOPs; the worst offenders are "
                        "the post-route-concat 1x1 convs)")
    p.add_argument("--int8-split-concat", action="store_true",
                   help="with --int8-calib: give each branch of a "
                        "route-concat conv input its own calibrated scale "
                        "(the conv splits along the reduction dim on the "
                        "int8 MXU — same FLOPs).  Targets the measured "
                        "worst int8 noise source: bimodal concat "
                        "magnitudes defeating per-tensor scales")
    p.add_argument("--int8-smooth", type=float, default=None, nargs="?",
                   const=0.5, metavar="ALPHA",
                   help="with --int8-calib: SmoothQuant-style per-channel "
                        "smoothing — each conv input channel gets its own "
                        "quantization grid, folded into the int8 kernels "
                        "at calibration (zero runtime FLOPs; ALPHA in "
                        "[0,1] balances activation vs weight difficulty, "
                        "default 0.5).  Exclusive with --int8-split-concat")
    p.add_argument("--int8-bias-correct", action="store_true",
                   help="with --int8-calib: DFQ-style bias correction — "
                        "each quantized conv's mean pre-activation error "
                        "on the calibration images is absorbed into its "
                        "bias (zero runtime cost; deltas persist in the "
                        "scales file)")
    p.add_argument("--int8-weights-only", action="store_true",
                   help="with --int8: weight-only quantization (W8) — "
                        "kernels stream as int8 and dequantize per call, "
                        "activations stay in the compute dtype.  bf16-"
                        "class accuracy (weight rounding only) at 4x less "
                        "weight memory than fp32; no calibration needed "
                        "or accepted")
    p.add_argument("--int8-recipe", choices=("auto", "none"), default=None,
                   help="calibration recipe policy.  'auto' (the DEFAULT "
                        "whenever --int8-calib is given without explicit "
                        "knobs) applies the measured best zero-cost recipe "
                        "(p99.9 percentile ranging + per-channel smoothing "
                        "+ bias correction — best on every family, PERF.md "
                        "round-3 ladder; TPU drift bound "
                        "perf/harvest_r4.jsonl).  'none' opts out (plain "
                        "min/max-margin calibration).  Mutually exclusive "
                        "with the explicit knobs")
    p.add_argument("--int8-scales", default=None, metavar="JSON",
                   help="persisted static activation scales: if JSON exists "
                        "it is loaded (no calibration forward needed); "
                        "otherwise the scales calibrated via --int8-calib "
                        "are written there (calibrate once, serve many)")
    p.add_argument("--devices", type=int, default=1, metavar="N",
                   help="shard the batch over the first N local accelerator "
                        "devices via a GSPMD batch mesh (outputs gathered "
                        "over ICI; parallel/sharding.py).  1 = single "
                        "device (default), 0 = every local device")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache "
                        "(~/.cache/pytorch_yolo_tpu/xla)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace to DIR")
    p.add_argument("--interp", default="linear", choices=("linear", "cubic"),
                   help="letterbox resize interpolation")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax NaN checking (debug mode, SURVEY.md §5.2)")
    p.add_argument("-v", "--verbose", action="store_true")


def _parse_reso(s: str):
    """416 -> 416; 256x416 -> (256, 416) (HxW, the API's tuple form)."""
    if "x" in s.lower():
        h, w = s.lower().split("x", 1)
        return (int(h), int(w))
    return int(s)


def _load_calib_images(directory: str, limit: int = 8) -> list:
    """Load up to ``limit`` images from a directory for int8 calibration."""
    import cv2

    paths = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.lower().endswith(IMAGE_EXTS))[:limit]
    imgs = [im for im in (cv2.imread(p) for p in paths) if im is not None]
    if not imgs:
        raise SystemExit(f"--int8-calib: no readable images in {directory}")
    return imgs


def _build_detector(args) -> Detector:
    import jax.numpy as jnp

    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    source = args.cfg or args.model
    if source is None:
        raise SystemExit("one of --model / --cfg is required")
    if not getattr(args, "no_compile_cache", False):
        from .utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    kw = {"interp": getattr(args, "interp", "linear")}
    n_dev = getattr(args, "devices", 1)
    if n_dev != 1:
        import jax

        from .parallel.sharding import make_batch_mesh

        devs = jax.devices()
        if n_dev == 0:
            n_dev = len(devs)
        if not 1 <= n_dev <= len(devs):
            raise SystemExit(f"--devices {n_dev}: only {len(devs)} local "
                             f"device(s) available")
        if n_dev > 1:
            kw.update(mesh=make_batch_mesh(devs[:n_dev]))
            log.info("sharding batches over %d devices", n_dev)
            batch = getattr(args, "batch", None)
            if batch is not None:
                from .parallel.sharding import pad_to_multiple

                # prepared pipelines (detect_many/evaluate/serve) stack
                # fixed-size chunks; GSPMD needs the chunk to divide the
                # mesh, so round the bucket up rather than erroring later
                args.batch = pad_to_multiple(batch, n_dev)
                if args.batch != batch:
                    log.info("rounded --batch %d up to %d (multiple of %d "
                             "mesh devices)", batch, args.batch, n_dev)
    if args.bf16:
        kw.update(compute_dtype=jnp.bfloat16, precision="default")
    calib_dir = getattr(args, "int8_calib", None)
    if calib_dir and not getattr(args, "int8", False):
        raise SystemExit("--int8-calib requires --int8 (static scales "
                         "calibrate the int8 serving path)")
    scales_path = getattr(args, "int8_scales", None)
    if scales_path and not getattr(args, "int8", False):
        raise SystemExit("--int8-scales requires --int8")
    if getattr(args, "int8_skip_noisy", 0) and not calib_dir:
        raise SystemExit("--int8-skip-noisy requires --int8-calib DIR "
                         "(noise attribution runs on the calibration "
                         "images)")
    if getattr(args, "int8_split_concat", False) and not calib_dir:
        raise SystemExit("--int8-split-concat requires --int8-calib DIR "
                         "(per-branch scales come from the calibration "
                         "images)")
    if getattr(args, "int8_smooth", None) is not None and not calib_dir:
        raise SystemExit("--int8-smooth requires --int8-calib DIR "
                         "(per-channel grids come from the calibration "
                         "images)")
    if getattr(args, "int8_bias_correct", False) and not calib_dir:
        raise SystemExit("--int8-bias-correct requires --int8-calib DIR "
                         "(the correction averages quantization error on "
                         "the calibration images)")
    if getattr(args, "int8_recipe", None) == "auto" and not calib_dir:
        raise SystemExit("--int8-recipe auto requires --int8-calib DIR "
                         "(the recipe is a calibration policy; 'none' is "
                         "only meaningful with calibration too)")
    if getattr(args, "int8", False):
        weights_only = getattr(args, "int8_weights_only", False)
        if weights_only and (calib_dir or scales_path):
            raise SystemExit("--int8-weights-only has no activation "
                             "quantization — drop --int8-calib/--int8-"
                             "scales (w8a8 concepts)")
        kw.update(quant="w8" if weights_only else "w8a8",
                  quant_skip_layers=(
                      "heads" if getattr(args, "int8_skip_heads", True) else ()))
        if scales_path and os.path.exists(scales_path):
            with open(scales_path, "r", encoding="utf-8") as f:
                state = json.load(f)
            recipe = getattr(args, "int8_recipe", None)
            # "none" never needs a calibration run — any persisted scales
            # load as-is; "auto" only reloads a file stamped by the same
            # recipe (a calibrated file IS the recipe's output).
            if recipe == "auto" and isinstance(state, dict) \
                    and state.get("recipe") == recipe:
                pass  # restart-safe: the file IS this recipe's output
            elif getattr(args, "int8_skip_noisy", 0) or \
                    getattr(args, "int8_split_concat", False) or \
                    getattr(args, "int8_smooth", None) is not None or \
                    getattr(args, "int8_bias_correct", False) or \
                    recipe == "auto":
                raise SystemExit(
                    "--int8-skip-noisy/--int8-split-concat/--int8-smooth/"
                    f"--int8-bias-correct/--int8-recipe need a calibration "
                    f"run; {scales_path} already exists and its persisted "
                    "state applies — delete it to re-calibrate (a file "
                    "stamped by --int8-recipe reloads under the same "
                    "recipe flag)")
            if isinstance(state, dict) and state.get("calib_size"):
                served = args.reso if isinstance(args.reso, tuple) \
                    else (args.reso, args.reso)
                if tuple(state["calib_size"]) != served:
                    log.warning(
                        "--int8-scales %s was calibrated at %s but serving "
                        "at %s: static scales are only valid at the "
                        "calibrated size (measured: a 2x mismatch dropped "
                        "set agreement 0.66->0.11 on yolov4-p6) — delete "
                        "the file to re-calibrate at --reso",
                        scales_path, state["calib_size"], list(served))
            if isinstance(state, dict) and "scales" in state:
                # quant_state() format: scales + the resolved skip set of
                # the calibration run (reproduces the exact quantized-conv
                # partition, incl. --int8-skip-noisy picks).
                kw.update(quant_act_scales=state["scales"],
                          quant_skip_layers=frozenset(
                              int(i) for i in state.get("skip", ())))
                if state.get("bias_delta"):
                    kw.update(quant_bias_delta=state["bias_delta"])
            else:  # legacy flat {idx: scale}: default skip policy
                kw.update(quant_act_scales=state)
            log.info("loaded static int8 scales from %s (no calibration "
                     "forward)", scales_path)
        elif calib_dir:
            # CLI images load via cv2.imread (BGR) and detect() defaults
            # bgr=True, so calibration runs on the served channel order.
            kw.update(quant_calib=_load_calib_images(calib_dir),
                      # Calibrate at the SERVED resolution, not the cfg's
                      # [net] size (r5 finding: p6 calib@1280/served@640
                      # dropped static-int8 agreement 0.66->0.11 —
                      # activation maxima scale with spatial extent)
                      quant_calib_size=args.reso,
                      quant_calib_margin=getattr(args, "int8_calib_margin", 1.0),
                      quant_calib_percentile=getattr(
                          args, "int8_calib_percentile", None),
                      quant_skip_noisy=getattr(args, "int8_skip_noisy", 0),
                      quant_split_concat=getattr(
                          args, "int8_split_concat", False),
                      quant_smooth=getattr(args, "int8_smooth", None),
                      quant_bias_correct=getattr(
                          args, "int8_bias_correct", False),
                      quant_recipe=getattr(args, "int8_recipe", None))
        elif scales_path:
            raise SystemExit(f"--int8-scales {scales_path}: file does not "
                             "exist and no --int8-calib DIR given to "
                             "calibrate it")
    weights = args.weights
    if weights is None and not source.endswith(".cfg"):
        # auto-adopt driver-provided assets the moment they appear (reuse a
        # report an earlier step already scanned, e.g. cmd_evaluate's)
        report = getattr(args, "_asset_report", None)
        if report is None:
            from .assets import scan_assets

            report = scan_assets()
        want = f"{source}.weights"
        hit = next((w for w in report.weights
                    if w.expected_name == want and w.header_ok), None)
        if hit is not None:
            weights = hit.path
            log.info("using discovered weights asset: %s", weights)
    det = Detector.load(source, weights, names=args.names, **kw)
    det.weights_source = weights  # provenance: None = synthetic random
    if scales_path and not os.path.exists(scales_path):
        state = det.quant_state()
        with open(scales_path, "w", encoding="utf-8") as f:
            json.dump(state, f)
        log.info("wrote %d calibrated int8 scales (+%d-conv skip set) to %s",
                 len(state["scales"]), len(state["skip"]), scales_path)
    if weights is None:
        log.warning("no --weights given and no asset found: using synthetic "
                    "random weights (run `pytorch_yolo_tpu assets` for the "
                    "expected drop points)")
    return det


@contextlib.contextmanager
def _maybe_profile(trace_dir):
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


def cmd_detect(args) -> int:
    import cv2

    det = _build_detector(args)
    if os.path.isdir(args.images):
        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if f.lower().endswith(IMAGE_EXTS))
    else:
        paths = [args.images]
    if not paths:
        raise SystemExit(f"no images found in {args.images}")
    os.makedirs(args.det, exist_ok=True)

    stats = PipelineStats()
    stats.start()

    # Group images by source shape so each group runs as true batches under
    # one compiled pipeline (BASELINE.json:9 batched inference).
    groups: dict[tuple, list[tuple[str, "np.ndarray"]]] = {}
    for path in paths:
        with stats.stage("read"):
            img = cv2.imread(path)
        if img is None:
            log.warning("cannot read %s, skipping", path)
            continue
        groups.setdefault(img.shape, []).append((path, img))

    json_out = open(os.path.join(args.det, "detections.jsonl"), "w",
                    encoding="utf-8") if args.save_json else None
    for shape, items in groups.items():
        for start in range(0, len(items), args.batch):
            chunk = items[start : start + args.batch]
            batch = np.stack([im for _, im in chunk])
            with stats.stage("detect"):
                dets = det.detect_batch(batch, size=args.reso, conf=args.confidence,
                                        iou=args.nms_thresh, max_det=args.max_det)
            with stats.stage("draw+write"):
                for (path, img), d in zip(chunk, dets):
                    if json_out is not None:
                        json_out.write(json.dumps({
                            "image": path,
                            "boxes": d.boxes.round(2).tolist(),
                            "obj": d.obj.round(4).tolist(),
                            "cls_score": d.cls_score.round(4).tolist(),
                            "cls_id": d.cls_id.tolist(),
                            "names": [det.class_names[c] for c in d.cls_id],
                        }) + "\n")
                    draw_detections(img, d.boxes, d.cls_id, d.obj, det.class_names)
                    out_path = os.path.join(args.det, "det_" + os.path.basename(path))
                    cv2.imwrite(out_path, img)
                    names = [det.class_names[c] for c in d.cls_id]
                    log.info("%s: %d objects %s -> %s", path, len(d),
                             sorted(set(names)), out_path)
            stats.count(len(chunk))
    if json_out is not None:
        json_out.close()
    print(stats.report(), file=sys.stderr)
    return 0


def cmd_video(args) -> int:
    import cv2

    from .video import run_video

    det = _build_detector(args)
    source = int(args.source) if args.source.isdigit() else args.source
    writer = None
    stats = PipelineStats()
    shown = 0
    t0 = time.perf_counter()
    for fr in run_video(source, det, size=args.reso, conf=args.confidence,
                        iou=args.nms_thresh, max_det=args.max_det,
                        stats=stats, max_frames=args.frames):
        d = fr.detection
        draw_detections(fr.frame, d.boxes, d.cls_id, d.obj, det.class_names)
        if args.out:
            if writer is None:
                h, w = fr.frame.shape[:2]
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.fps, (w, h))
            writer.write(fr.frame)
        if args.show:
            cv2.imshow("pytorch_yolo_tpu", fr.frame)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                break
        shown += 1
        if shown % 50 == 0:
            fps = shown / (time.perf_counter() - t0)
            log.info("frame %d  FPS %.1f", fr.index, fps)
    if writer is not None:
        writer.release()
    print(stats.report(), file=sys.stderr)
    return 0


def cmd_evaluate(args) -> int:
    """COCO mAP evaluation: the BASELINE.json:2 accuracy metric."""
    import cv2

    from .datasets import load_coco
    from .eval import ImageEval, evaluate, evaluate_coco

    if args.images is None or args.annotations is None:
        from .assets import report_text, scan_assets

        report = scan_assets()
        args._asset_report = report  # let _build_detector reuse the scan
        pair = report.matched_eval_pair()  # matched, not independent [0]s
        if pair is not None:
            if args.annotations is None:
                args.annotations = pair[0]
                log.info("using discovered annotations: %s", args.annotations)
            if args.images is None:
                args.images = pair[1]
                log.info("using discovered image dir: %s", args.images)
        if args.images is None or args.annotations is None:
            print(report_text(report), file=sys.stderr)
            raise SystemExit("evaluate needs --images/--annotations (no asset found)")

    det = _build_detector(args)
    evals = []
    stats = PipelineStats()
    stats.start()
    skipped: list[str] = []
    kept_samples: list = []

    def image_gen():
        for sample in load_coco(args.annotations, args.images,
                                max_images=args.max_images):
            img = cv2.imread(sample.path)
            if img is None:
                skipped.append(sample.path)
                continue
            kept_samples.append(sample)
            yield img

    # Batched evaluate on mesh AND single device (VERDICT r3 #3): a batch-1
    # stream pays the per-dispatch floor on every image (this container's
    # tunnel adds ~8.6 ms/call — PERF.md), while u8-canvas batches through
    # detect_many amortize it AND cut H2D 4x (the ~105 img/s link-bound
    # class).  host letterboxing handles COCO's heterogeneous sizes under
    # one compiled pipeline; on a mesh the batch additionally shards.
    def _batched():
        # Super-chunks of 8 device batches: detect_many double-buffers
        # host letterboxing against device compute WITHIN a call, so
        # the pipeline bubble at each boundary amortizes to ~1/8.
        span = args.batch * 8
        chunk: list = []
        for img in image_gen():
            chunk.append(img)
            if len(chunk) == span:
                yield from det.detect_many(
                    chunk, size=args.reso, conf=args.confidence,
                    iou=args.nms_thresh, max_det=args.max_det,
                    batch=args.batch, transfer="u8")
                chunk = []
        if chunk:
            yield from det.detect_many(
                chunk, size=args.reso, conf=args.confidence,
                iou=args.nms_thresh, max_det=args.max_det,
                batch=args.batch, transfer="u8")

    det_iter = _batched()
    # Steady-state split (VERDICT r3 #3): the whole-run rate folds in
    # one-time costs a val2017-scale run pays once (TPU grant acquisition,
    # pipeline compile / cache load, first-chunk warmup), which dominate
    # short runs and make the amortized rate look link-pathological.
    # t_steady marks the first super-chunk's completion; the steady rate
    # covers everything after it (decode+letterbox+H2D+compute+D2H).
    t_steady, n_steady = None, 0
    for i, d in enumerate(det_iter):
        sample = kept_samples[i]
        score = d.obj * d.cls_score if args.score == "obj*cls" else d.obj
        evals.append(ImageEval(
            det_boxes=d.boxes, det_scores=score, det_classes=d.cls_id,
            gt_boxes=sample.gt_boxes, gt_classes=sample.gt_classes,
            gt_crowd=sample.gt_crowd))
        stats.count()
        if i + 1 == args.batch * 8:  # first super-chunk done
            t_steady, n_steady = time.perf_counter(), i + 1
    steady = ((len(evals) - n_steady) / (time.perf_counter() - t_steady)
              if t_steady is not None and len(evals) > n_steady else None)
    if skipped:
        log.warning("skipped %d unreadable images", len(skipped))
    if getattr(args, "save_dets", None):
        # one triplet of arrays per image, keyed by index — the comparison
        # contract for calibrate-vs-reload drills (VERDICT r4 weak #6)
        dump = {}
        for i, e in enumerate(evals):
            dump[f"boxes_{i}"] = np.asarray(e.det_boxes)
            dump[f"scores_{i}"] = np.asarray(e.det_scores)
            dump[f"classes_{i}"] = np.asarray(e.det_classes)
        np.savez_compressed(args.save_dets, n_images=len(evals), **dump)
        log.info("wrote %d images' detections to %s", len(evals),
                 args.save_dets)
    r50 = evaluate(evals, iou_thresh=0.5)
    coco = evaluate_coco(evals)
    print(json.dumps({
        "images": len(evals),
        "mAP@0.5": round(r50["mAP"], 4),
        "AP@[.5:.95]": round(coco["AP"], 4),
        "AP75": round(coco["AP75"], 4),
        "images_per_sec": round(stats.throughput(), 2),
        "images_per_sec_steady": (round(steady, 2) if steady is not None
                                  else None),
        # machine-readable provenance: a synthetic-weights run must never be
        # mistaken for a real parity number
        "weights": det.weights_source or "SYNTHETIC-RANDOM",
    }))
    print(stats.report(), file=sys.stderr)
    return 0


def cmd_info(args) -> int:
    """Print a model summary (layers, params, heads, detection counts)."""
    from .config import ConvSpec, load_model_spec
    from .models.zoo import model_spec as zoo_spec
    from .weights import param_count

    source = args.cfg or args.model
    if source is None:
        raise SystemExit("one of --model / --cfg is required")
    spec = load_model_spec(source) if source.endswith(".cfg") else zoo_spec(source)
    convs = [l for l in spec.layers if isinstance(l, ConvSpec)]
    heads = spec.yolo_layers
    from .config import head_strides

    print(f"model: {source}")
    print(f"layers: {len(spec.layers)}  convs: {len(convs)}  "
          f"params: {param_count(spec):,} ({param_count(spec) * 4 / 1e6:.1f} MB fp32)")
    if not source.endswith(".cfg"):
        from .models.zoo import TOPOLOGY_PINS

        status, note = TOPOLOGY_PINS.get(source, (None, None))
        if status is not None:
            print(f"topology: {status} — {note}")
    print(f"net input: {spec.net.width}x{spec.net.height}  classes: {spec.num_classes}")
    for h, s in zip(heads, head_strides(spec)):
        print(f"  head @stride {s:>2}: anchors {h.anchors}")
    mod = max(32, max(head_strides(spec)))
    ladder = (320, 416, 608) if mod == 32 else (640, 896, 1280)
    for size in ladder:
        print(f"  detections @{size}: {spec.num_detections(size)}")
    if getattr(args, "int8_plan", False):
        _print_int8_plan(spec, convs)
    return 0


def _print_int8_plan(spec, convs) -> None:
    """The static-int8 (--int8 --bf16) policy this model gets by default:
    which convs stay fp and why, how many int8-resident links engage, and
    which convs are split-concat candidates.  Pure topology — no params
    are loaded (int8_resident_chains only membership-tests the pytree, so
    a marker dict stands in for quantized params).  Honors
    PYTORCH_YOLO_INT8_EARLY_STRIDE the same way Detector construction
    does, so the printout matches a forced-threshold deployment."""
    import os

    from .ops.quant import (concat_split_groups, default_early_min_stride,
                            early_conv_indices, early_skip_profitable,
                            head_conv_indices, int8_resident_chains)

    heads = head_conv_indices(spec)
    profitable = early_skip_profitable(spec)
    env = os.environ.get("PYTORCH_YOLO_INT8_EARLY_STRIDE")
    min_stride = int(env) if env is not None else default_early_min_stride(spec)
    early = (early_conv_indices(spec, min_stride) if min_stride > 1
             else frozenset())
    skip = heads | early
    quantized = [l.index for l in convs if l.index not in skip]
    marker = {i: {"wq": None, "sa": None} for i in quantized}
    chains = int8_resident_chains(spec, marker)
    splits = concat_split_groups(spec)
    print("int8 plan (defaults for --int8 --bf16):")
    if profitable:
        reason = f"no early maxpool ladder -> default stride<{min_stride} skip"
        if min_stride == 32:
            reason += " (stride-128-deep ladder: large-spatial stages lose int8)"
    else:
        reason = "early maxpool ladder -> int8-resident chains instead"
    src = f"env stride<{min_stride}" if env is not None else reason
    print(f"  early-skip profitable: {profitable} ({src})")
    print(f"  convs quantized: {len(quantized)}/{len(convs)}  "
          f"(fp: {len(heads)} head + {len(early)} early)")
    print(f"  int8-resident chain links: {len(chains)} "
          "(engage only with --int8-calib static scales; "
          "dynamic int8 has no resident links)")
    print(f"  split-concat candidates (--int8-split-concat): "
          f"{sorted(splits)}")


def cmd_serve(args) -> int:
    """HTTP detection server with micro-batching (serve.py)."""
    from .serve import make_server

    det = _build_detector(args)
    server = make_server(det, host=args.host, port=args.port, size=args.reso,
                         conf=args.confidence, iou=args.nms_thresh,
                         max_det=args.max_det, batch_max=args.batch,
                         batch_timeout_ms=args.batch_timeout_ms)
    # precompile exactly the batch buckets the MicroBatcher can dispatch —
    # read its own batch_max/bucket_floor so warmup can never desync from
    # the flush arithmetic — so no first client request waits on a compile
    import numpy as np

    from .serve import bucket_ladder

    ladder = bucket_ladder(server.batcher.batch_max,
                           server.batcher.bucket_floor)
    for b in ladder:
        rh, rw = ((args.reso, args.reso) if isinstance(args.reso, int)
                  else args.reso)
        x = np.zeros((b, rh, rw, 3), np.uint8)
        g = np.tile([[1.0, 0, 0, 1, 1]], (b, 1)).astype(np.float32)
        det.detect_prepared(x, g, args.reso, conf=args.confidence,
                            iou=args.nms_thresh, max_det=args.max_det)
    log.info("prepared pipelines warmed for batch buckets %s", ladder)
    host, port = server.server_address[:2]
    log.info("serving on http://%s:%s  (POST /detect, GET /healthz /stats)",
             host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.batcher.close()
    return 0


def cmd_profile(args) -> int:
    """Per-stage forward cost via truncated-prefix timing (PERF.md #4)."""
    import json as _json

    from .utils.profiling import profile_pipeline, profile_stages

    det = _build_detector(args)
    if args.pipeline:
        rows = profile_pipeline(det, size=args.reso, batch=args.batch,
                                iters=args.iters)
        print(_json.dumps(rows))
        for r in rows:
            print(f"  {r['stage']:<10}  cum {r['cum_ms']:8.2f} ms  "
                  f"delta {r['delta_ms']:8.2f} ms  {r['img_per_s']:8.1f} img/s",
                  file=sys.stderr)
        return 0
    rows = profile_stages(det, size=args.reso, batch=args.batch,
                          iters=args.iters)
    print(_json.dumps(rows))
    width = max(len(r["stage"]) for r in rows)
    for r in rows:
        print(f"  layer {r['layer']:>3}  {r['stage']:<{width}}  "
              f"cum {r['cum_ms']:8.2f} ms  delta {r['delta_ms']:8.2f} ms",
              file=sys.stderr)
    return 0


def cmd_assets(args) -> int:
    """Scan for driver-provided weights/COCO assets (VERDICT r1 #6).

    rc 0 when everything the mAP-parity run needs is present, 1 otherwise."""
    from .assets import report_text, scan_assets

    report = scan_assets(extra_dirs=args.dirs or None)
    print(report_text(report))
    return 0 if report.ready else 1


def cmd_export_cfg(args) -> int:
    from .models.zoo import write_cfg

    write_cfg(args.model, args.out, classes=args.classes)
    print(f"wrote {args.out}", file=sys.stderr)
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="pytorch_yolo_tpu",
                                 description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("detect", help="detect objects in image(s)")
    _add_common(p)
    p.add_argument("--images", required=True, help="image file or directory")
    p.add_argument("--det", default="det", help="output directory")
    p.add_argument("--batch", type=int, default=8,
                   help="max images per device batch (grouped by shape)")
    p.add_argument("--save-json", action="store_true",
                   help="also write <det>/detections.jsonl")
    p.set_defaults(fn=cmd_detect)

    p = sub.add_parser("video", help="video file / webcam detection")
    _add_common(p)
    p.add_argument("--source", required=True, help="video path or webcam index")
    p.add_argument("--out", default=None, help="output video path (mp4)")
    p.add_argument("--show", action="store_true", help="cv2.imshow preview")
    p.add_argument("--fps", type=float, default=30.0, help="output video fps")
    p.add_argument("--frames", type=int, default=None, help="stop after N frames")
    p.set_defaults(fn=cmd_video)

    p = sub.add_parser("evaluate", help="COCO mAP evaluation")
    _add_common(p)
    p.add_argument("--images", default=None,
                   help="COCO images directory (default: discovered asset)")
    p.add_argument("--annotations", default=None,
                   help="instances_*.json path (default: discovered asset)")
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--score", default="obj", choices=("obj", "obj*cls"),
                   help="detection score used for PR ranking")
    p.add_argument("--batch", type=int, default=16,
                   help="device batch for the chunked u8-canvas evaluate "
                        "path (single device AND mesh); 16 is the measured "
                        "link-bound sweet spot on this container's tunnel")
    p.add_argument("--save-dets", default=None, metavar="NPZ",
                   help="also dump per-image detections (boxes/scores/"
                        "classes) to an .npz — lets two evaluate runs be "
                        "compared at detection level, not just by mAP "
                        "(which is vacuously 0.0==0.0 on synthetic weights; "
                        "VERDICT r4 weak #6)")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("info", help="print a model summary")
    p.add_argument("--model", default=None)
    p.add_argument("--cfg", default=None)
    p.add_argument("--int8-plan", action="store_true",
                   help="also print the static-int8 serving plan this model "
                        "gets under the defaults (--int8 --bf16): skip set, "
                        "int8-resident chain links, split-concat candidates")
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("serve", help="HTTP detection server (micro-batched)")
    _add_common(p)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch", type=int, default=8,
                   help="max images coalesced into one device batch")
    p.add_argument("--batch-timeout-ms", type=float, default=5.0,
                   help="max wait to fill a batch before dispatching")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("profile", help="per-stage forward cost profile")
    _add_common(p)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--pipeline", action="store_true",
                   help="profile e2e pipeline stages (letterbox/forward/"
                        "decode/nms) instead of forward layers")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("assets", help="scan for driver-provided weights/COCO "
                                      "assets and print the parity command")
    p.add_argument("dirs", nargs="*", help="extra directories to scan")
    p.set_defaults(fn=cmd_assets)

    p = sub.add_parser("export-cfg", help="emit a zoo model as a Darknet .cfg")
    p.add_argument("--model", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--classes", type=int, default=80)
    p.set_defaults(fn=cmd_export_cfg)

    args = ap.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if getattr(args, "verbose", False) else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s")
    with _maybe_profile(getattr(args, "profile", None)):
        return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
