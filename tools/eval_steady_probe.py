"""Standalone amortized-evaluate probe: the VERDICT r3 #3 wall-time bound.

Re-runs ONLY the asset-day drill's amortized evaluate leg (synthesize the
real-shaped stand-ins, then one 500-image evaluate subprocess) so the
steady-state split added to the evaluate CLI (images_per_sec_steady) can be
banked without re-paying the full drill.  Emits the same JSON rows the
drill does; the val2017 projection is measured fixed cost + 5000 images at
the measured steady rate.

  python tools/eval_steady_probe.py [--dir /tmp/asset_drill_probe]
      [--model yolov3] [--images 500] [--reso 416] [--keep]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from asset_day_drill import emit, evaluate_amortized, make_coco, make_weights


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/asset_drill_probe")
    ap.add_argument("--model", default="yolov3")
    ap.add_argument("--images", type=int, default=500)
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    t_all = time.perf_counter()
    # Only a directory this probe created may be cleaned up at exit
    # (ADVICE r4: pointing --dir at a pre-existing directory with
    # unrelated content must not silently wipe it).
    created_dir = not os.path.exists(args.dir)
    if not created_dir and not args.keep and os.listdir(args.dir):
        print(f"refusing to reuse non-empty {args.dir} without --keep "
              "(it would be deleted at exit)", file=sys.stderr)
        return 2
    os.makedirs(args.dir, exist_ok=True)
    env = dict(os.environ)
    env["PYTORCH_YOLO_ASSETS"] = args.dir
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    make_weights(args.model, os.path.join(args.dir, f"{args.model}.weights"))
    make_coco(args.dir, args.images)
    evaluate_amortized(env, args.model, args.reso, args.images)
    emit(step="done", total_seconds=round(time.perf_counter() - t_all, 1))
    if not args.keep:
        shutil.rmtree(args.dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
