"""Generate golden .npz fixtures from the torch/numpy oracle (SURVEY.md §4.2.1).

Run from the repo root:  python tests/make_goldens.py
Regenerates tests/goldens/*.npz deterministically; the parity tests in
test_goldens.py compare the JAX framework against these without needing
torch at test time.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tests.oracle.torch_ref import (  # noqa: E402
    decode_oracle,
    letterbox_oracle,
    nms_oracle,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
ANCHORS = ((81, 82), (135, 169), (344, 319))


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    rng = np.random.default_rng(20260816)

    # 1. decode: one 13x13 head
    raw = rng.normal(0, 1, size=(1, 255, 13, 13)).astype(np.float32)
    dec = decode_oracle(raw, ANCHORS, 32, 80)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "decode.npz"),
                        raw_nchw=raw, decoded=dec,
                        anchors=np.asarray(ANCHORS, np.float32), stride=32, classes=80)

    # 2. letterbox: odd-sized uint8 image -> 128
    img = rng.integers(0, 256, size=(67, 101, 3), dtype=np.uint8)
    lb = letterbox_oracle(img, 128)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "letterbox.npz"),
                        image=img, letterboxed=lb, size=128)

    # 3. NMS keep rows on a synthetic decoded field
    from tests.test_nms import random_detections

    det = random_detections(np.random.default_rng(7), d=400)
    rows = nms_oracle(det, 0.5, 0.45)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "nms.npz"),
                        detections=det, kept_rows=rows,
                        conf=np.float32(0.5), iou=np.float32(0.45))
    print(f"wrote goldens to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
