"""Asset-day drill: rehearse the real-assets mAP run on synthetic stand-ins.

The one still-blocked mandate is mAP parity on real weights + COCO val
(BASELINE.json:2; VERDICT r2 #3) — blocked on assets, not code.  This tool
makes asset day a rehearsed one-command event by synthesizing *real-shaped*
stand-ins and running the complete flow end-to-end, timed:

  1. synthesize ``<model>.weights`` — correct Darknet v0.2 header, correct
     byte-for-byte size (yolov3: 248 007 048 B, validated against the
     public release size assets.py expects);
  2. synthesize a COCO val tree — ``val2017/`` jpgs at heterogeneous
     resolutions + ``instances_val2017.json`` with boxes/classes/crowd
     flags using the real sparse COCO category ids;
  3. ``python -m pytorch_yolo_tpu assets`` must report READY;
  4. ``python -m pytorch_yolo_tpu evaluate`` must auto-discover everything
     and emit its mAP JSON (mAP itself is meaningless on random weights —
     the drill proves the *mechanics*, not accuracy);
  5. checkpoint the loaded detector, reload from the checkpoint, re-evaluate
     in-process, and require identical detections + matching mAP.

On asset day: drop the real files at any documented location (or set
``PYTORCH_YOLO_ASSETS``) and run step 3's command — everything else is
identical to this rehearsal.

  python tools/asset_day_drill.py [--dir /tmp/asset_drill] [--model yolov3]
      [--images 50] [--eval-images 20] [--reso 416] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The 80 sparse COCO category ids (1..90 with gaps), coco.names order.
COCO_CAT_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21,
    22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42,
    43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
    62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84,
    85, 86, 87, 88, 89, 90,
]


def emit(**kw):
    print(json.dumps(kw), flush=True)


def step(name):
    def wrap(fn):
        def run(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            emit(step=name, seconds=round(time.perf_counter() - t0, 2),
                 **(out if isinstance(out, dict) else {}))
            return out
        return run
    return wrap


@step("synthesize_weights")
def make_weights(model: str, path: str) -> dict:
    from pytorch_yolo_tpu.assets import EXPECTED_WEIGHTS
    from pytorch_yolo_tpu.models.zoo import model_spec
    from pytorch_yolo_tpu.weights import random_raw_params, write_weights_file

    spec = model_spec(model)
    write_weights_file(spec, random_raw_params(spec, seed=0), path,
                       seen=32013312, version=(0, 2, 0))
    size = os.path.getsize(path)
    expected = EXPECTED_WEIGHTS.get(f"{model}.weights")
    if expected is not None and size != expected:
        raise SystemExit(
            f"synthetic {model}.weights is {size:,} B, public release is "
            f"{expected:,} B — the architecture or writer drifted")
    return {"path": path, "bytes": size,
            "matches_public_size": expected is not None}


@step("synthesize_coco")
def make_coco(root: str, n_images: int) -> dict:
    import cv2

    img_dir = os.path.join(root, "val2017")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    shapes = [(480, 640), (427, 640), (375, 500), (640, 480), (426, 564)]
    images, annotations = [], []
    ann_id = 1
    for i in range(n_images):
        h, w = shapes[i % len(shapes)]
        name = f"{i + 1:012d}.jpg"
        frame = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        # blocky structure so jpgs aren't pure noise (compresses, decodes fast)
        frame[:: 8] = frame[:: 8] // 2
        cv2.imwrite(os.path.join(img_dir, name), frame)
        images.append({"id": i + 1, "file_name": name, "width": w, "height": h})
        for _ in range(int(rng.integers(1, 6))):
            bw, bh = rng.uniform(20, w / 2), rng.uniform(20, h / 2)
            x, y = rng.uniform(0, w - bw), rng.uniform(0, h - bh)
            annotations.append({
                "id": ann_id, "image_id": i + 1,
                "category_id": int(rng.choice(COCO_CAT_IDS)),
                "bbox": [round(x, 1), round(y, 1), round(bw, 1), round(bh, 1)],
                "area": round(bw * bh, 1),
                "iscrowd": int(rng.random() < 0.05),
            })
            ann_id += 1
    ann_path = os.path.join(root, "instances_val2017.json")
    with open(ann_path, "w", encoding="utf-8") as f:
        json.dump({
            "images": images,
            "annotations": annotations,
            "categories": [{"id": cid, "name": f"class{cid}"}
                           for cid in COCO_CAT_IDS],
        }, f)
    return {"images": len(images), "annotations": len(annotations),
            "dir": img_dir, "json": ann_path}


def _run(cmd: list[str], env: dict, timeout: int = 3600) -> subprocess.CompletedProcess:
    return subprocess.run(cmd, capture_output=True, text=True, env=env,
                          cwd=REPO, timeout=timeout)


@step("asset_scan")
def scan(env) -> dict:
    proc = _run([sys.executable, "-m", "pytorch_yolo_tpu", "assets"], env)
    ready = "READY" in (proc.stdout + proc.stderr)
    if proc.returncode != 0 or not ready:
        raise SystemExit(f"asset scan not READY (rc={proc.returncode}):\n"
                         f"{proc.stdout}\n{proc.stderr[-800:]}")
    return {"ready": True}


@step("evaluate_cli")
def evaluate_cli(env, model: str, reso: int, max_images: int) -> dict:
    proc = _run([sys.executable, "-m", "pytorch_yolo_tpu", "evaluate",
                 "--model", model, "--reso", str(reso),
                 "--confidence", "0.005", "--nms_thresh", "0.45",
                 "--score", "obj*cls", "--max-images", str(max_images)], env)
    if proc.returncode != 0:
        raise SystemExit(f"evaluate failed rc={proc.returncode}:\n"
                         f"{proc.stderr[-1200:]}")
    line = next(l for l in proc.stdout.splitlines() if l.startswith("{"))
    result = json.loads(line)
    if result.get("weights") in (None, "SYNTHETIC-RANDOM"):
        raise SystemExit("evaluate did not adopt the discovered weights — "
                         "auto-discovery regressed")
    return {"result": result}


@step("evaluate_amortized")
def evaluate_amortized(env, model: str, reso: int, n: int) -> dict:
    """The VERDICT-r3 #3 leg: a large evaluate pass AFTER the warm pass, so
    the reported rate is the amortized steady-state (weight load is still
    included — it is a real part of any evaluate run — but compiles come
    from the persistent cache warmed by evaluate_cli).  Projects the
    val2017-scale (5000-image) wall time from the measured rate."""
    t0 = time.perf_counter()
    proc = _run([sys.executable, "-m", "pytorch_yolo_tpu", "evaluate",
                 "--model", model, "--reso", str(reso),
                 "--confidence", "0.005", "--nms_thresh", "0.45",
                 "--score", "obj*cls", "--max-images", str(n)], env,
                timeout=7200)
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise SystemExit(f"amortized evaluate failed rc={proc.returncode}:\n"
                         f"{proc.stderr[-1200:]}")
    line = next(l for l in proc.stdout.splitlines() if l.startswith("{"))
    result = json.loads(line)
    rate = result["images_per_sec"]
    # Projection = measured one-time costs (interpreter+imports, TPU grant
    # acquisition, weight load, compile-cache load, first super-chunk) +
    # 5000 images at the measured steady-state rate.  The whole-run rate
    # alone is dominated by those one-time costs at drill sizes and would
    # project a 5000-image pass as if it re-paid them ten times over.
    steady = result.get("images_per_sec_steady")
    # ADVICE r4: a run too short for a steady segment must not silently
    # fall back to the whole-run rate (that re-amortizes the one-time
    # costs into all 5000 projected images — the exact distortion the
    # steady split removes).  Flag the degraded mode instead.
    steady_fallback = steady is None
    eff = rate if steady_fallback else steady
    n_done = result["images"]
    fixed_s = max(0.0, round(wall - n_done / eff, 1)) if eff else None
    proj = (round(fixed_s + 5000.0 / eff, 1)
            if eff and fixed_s is not None else None)
    return {"images": n_done, "wall_s": round(wall, 1),
            "images_per_sec": rate, "images_per_sec_steady": steady,
            "steady_fallback": steady_fallback,
            "fixed_cost_s": fixed_s, "val2017_projection_s": proj}


@step("int8_scales_rehearsal")
def int8_scales_rehearsal(env, model: str, reso: int, max_images: int,
                          drill_dir: str, img_dir: str) -> dict:
    """Rehearse the production int8 flow on the same stand-ins: calibrate
    static scales from the discovered val images and persist them
    (--int8-scales), then re-evaluate loading the file — the two runs must
    report identical accuracy numbers (calibrate once, serve many)."""
    scales = os.path.join(drill_dir, f"{model}.int8-scales.json")
    outs = []
    dets_npz = [os.path.join(drill_dir, f"{model}.int8-dets-{tag}.npz")
                for tag in ("calib", "reload")]
    # --int8-smooth + --int8-bias-correct + --int8-skip-noisy rehearse the
    # full accuracy stack: the persisted quant_state() (per-channel grids,
    # bias deltas AND the skip set) must make the reload bit-identical.
    # smooth(+bc on conv_conv) is the best measured zero-cost recipe
    # (PERF.md session 7); the drill exercises every persistence path.
    for npz, extra in zip(dets_npz,
                          (["--int8-calib", img_dir, "--int8-smooth", "0.5",
                            "--int8-bias-correct", "--int8-skip-noisy", "4"],
                           [])):
        proc = _run([sys.executable, "-m", "pytorch_yolo_tpu", "evaluate",
                     "--model", model, "--reso", str(reso),
                     "--confidence", "0.005", "--nms_thresh", "0.45",
                     "--score", "obj*cls", "--max-images", str(max_images),
                     "--int8", "--bf16", "--int8-scales", scales,
                     "--save-dets", npz] + extra,
                    env)
        if proc.returncode != 0:
            raise SystemExit(f"int8 evaluate failed rc={proc.returncode}:\n"
                             f"{proc.stderr[-1200:]}")
        line = next(l for l in proc.stdout.splitlines() if l.startswith("{"))
        outs.append(json.loads(line))
    # Detection-level persistence check (VERDICT r4 weak #6: the old
    # mAP-equality assert is vacuous at synthetic 0.0==0.0): the reload
    # run must reproduce the calibration run's per-image detections.
    a, b = (np.load(p) for p in dets_npz)
    n = int(a["n_images"])
    if n != int(b["n_images"]) or n == 0:
        raise SystemExit(f"int8 det dumps disagree on image count: "
                         f"{n} vs {int(b['n_images'])}")
    n_dets = 0
    for i in range(n):
        for ch, atol in (("boxes", 1e-3), ("scores", 1e-5), ("classes", 0)):
            np.testing.assert_allclose(
                a[f"{ch}_{i}"], b[f"{ch}_{i}"], rtol=1e-5, atol=atol,
                err_msg=f"persisted-scales reload diverged from the "
                        f"calibration run at image {i} ({ch})")
        n_dets += len(a[f"boxes_{i}"])
    if outs[0]["mAP@0.5"] != outs[1]["mAP@0.5"]:
        raise SystemExit(f"persisted-scales run diverged from calibration "
                         f"run: {outs[0]['mAP@0.5']} vs {outs[1]['mAP@0.5']}")
    with open(scales) as f:
        state = json.load(f)
    n_scales = len(state["scales"]) if "scales" in state else len(state)
    return {"scales": scales, "n_scales": n_scales,
            "n_skip": len(state.get("skip", ())),
            "map_int8sb": outs[1]["mAP@0.5"],
            "dets_compared": n, "n_dets_matched": int(n_dets)}


@step("checkpoint_roundtrip")
def checkpoint_roundtrip(drill_dir: str, model: str, weights: str,
                         ann: str, img_dir: str, reso: int,
                         n_eval: int) -> dict:
    import cv2

    from pytorch_yolo_tpu.api import Detector
    from pytorch_yolo_tpu.datasets import load_coco
    from pytorch_yolo_tpu.eval import ImageEval, evaluate

    det = Detector.load(model, weights)
    ckpt = os.path.join(drill_dir, f"{model}.ckpt")
    det.save_checkpoint(ckpt)
    det2 = Detector.from_checkpoint(ckpt)

    def run_eval(d):
        evals = []
        for s in list(load_coco(ann, img_dir, max_images=n_eval)):
            img = cv2.imread(s.path)
            r = d.detect(img, size=reso, conf=0.005, iou=0.45)
            evals.append(ImageEval(
                det_boxes=r.boxes, det_scores=r.obj * r.cls_score,
                det_classes=r.cls_id, gt_boxes=s.gt_boxes,
                gt_classes=s.gt_classes, gt_crowd=s.gt_crowd))
        return evals

    e1, e2 = run_eval(det), run_eval(det2)
    for a, b in zip(e1, e2):
        np.testing.assert_allclose(a.det_boxes, b.det_boxes, rtol=1e-5,
                                   atol=1e-3)
    m1 = evaluate(e1, iou_thresh=0.5)["mAP"]
    m2 = evaluate(e2, iou_thresh=0.5)["mAP"]
    if abs(m1 - m2) > 1e-6:
        raise SystemExit(f"checkpoint-reload mAP drifted: {m1} vs {m2}")
    return {"ckpt": ckpt, "map_weights": round(m1, 4),
            "map_checkpoint": round(m2, 4)}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/asset_drill")
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--images", type=int, default=50)
    ap.add_argument("--eval-images", type=int, default=20,
                    help="images the timed evaluate pass runs over")
    ap.add_argument("--amortized-images", type=int, default=500,
                    help="images for the amortized-rate evaluate leg "
                         "(0 disables); sized so one-time costs wash out "
                         "and the val2017 wall-time projection is measured, "
                         "not extrapolated (VERDICT r3 #3)")
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--keep", action="store_true",
                    help="keep the drill tree (default: delete on success)")
    args = ap.parse_args()

    t_all = time.perf_counter()
    os.makedirs(args.dir, exist_ok=True)
    env = dict(os.environ)
    env["PYTORCH_YOLO_ASSETS"] = args.dir
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    w = make_weights(args.model, os.path.join(args.dir, f"{args.model}.weights"))
    coco = make_coco(args.dir, max(args.images, args.amortized_images))
    os.environ["PYTORCH_YOLO_ASSETS"] = args.dir  # in-process steps too
    scan(env)
    evaluate_cli(env, args.model, args.reso, args.eval_images)
    if args.amortized_images:
        evaluate_amortized(env, args.model, args.reso, args.amortized_images)
    int8_scales_rehearsal(env, args.model, args.reso,
                          min(8, args.eval_images), args.dir, coco["dir"])
    checkpoint_roundtrip(args.dir, args.model, w["path"], coco["json"],
                         coco["dir"], args.reso, min(4, args.eval_images))
    emit(step="done", total_seconds=round(time.perf_counter() - t_all, 1))
    if not args.keep:
        shutil.rmtree(args.dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
