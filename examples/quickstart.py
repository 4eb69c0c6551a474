"""Quickstart: load a model, detect on an image, draw and save the result.

Works fully offline: with no --weights the model gets synthetic random
weights (detections will be noise, but the whole bytes-to-boxes pipeline,
drawing, and timing run for real).

    python examples/quickstart.py --image path/to/dog.jpg \
        --weights yolov3-tiny.weights
"""

import argparse
import os
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))  # repo checkout
import pytorch_yolo_tpu as pyt
from pytorch_yolo_tpu.utils.draw import draw_detections


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", default=None, help="input image (default: synthetic)")
    ap.add_argument("--model", default="yolov3-tiny")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--out", default="quickstart_det.png")
    args = ap.parse_args()

    model = pyt.load(args.model, args.weights)

    if args.image:
        img = cv2.imread(args.image)
    else:
        img = np.random.default_rng(0).integers(0, 256, (480, 640, 3), dtype=np.uint8)

    # First call compiles the pipeline for this image shape; then it's cached.
    boxes, scores, classes = pyt.detect(model, img, conf=0.5, nms=0.4)
    t0 = time.perf_counter()
    boxes, scores, classes = pyt.detect(model, img, conf=0.5, nms=0.4)
    dt = time.perf_counter() - t0

    print(f"{len(boxes)} detections in {dt * 1e3:.1f} ms (steady state)")
    for b, s, c in zip(boxes[:10], scores[:10], classes[:10]):
        print(f"  {model.class_names[int(c)]:>14s}  {s:.2f}  {b.round(1)}")

    d = model.detect(img, conf=0.5)
    draw_detections(img, d.boxes, d.cls_id, d.obj, model.class_names)
    cv2.imwrite(args.out, img)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
