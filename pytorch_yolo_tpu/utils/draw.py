"""Box drawing for CLI outputs (reference: the ``write()``/draw helpers in
detect.py, SURVEY.md §2.1 #9).  OpenCV is an optional host-side dependency —
import is deferred so the core framework stays cv2-free."""

from __future__ import annotations

from typing import Sequence

import numpy as np

from .palette import class_colors


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    cls_ids: np.ndarray,
    scores: np.ndarray,
    class_names: Sequence[str],
    thickness: int = 2,
) -> np.ndarray:
    """Draw labeled boxes in-place on a BGR uint8 image; returns the image."""
    import cv2

    colors = class_colors(max(len(class_names), 1))
    for (x1, y1, x2, y2), cid, score in zip(boxes.astype(int), cls_ids, scores):
        color = colors[int(cid) % len(colors)]
        cv2.rectangle(image, (x1, y1), (x2, y2), color, thickness)
        name = class_names[int(cid)] if int(cid) < len(class_names) else str(int(cid))
        label = f"{name} {score:.2f}"
        (tw, th), baseline = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
        ty = max(y1, th + baseline)
        cv2.rectangle(image, (x1, ty - th - baseline), (x1 + tw, ty), color, -1)
        cv2.putText(image, label, (x1, ty - baseline // 2), cv2.FONT_HERSHEY_SIMPLEX,
                    0.5, (255, 255, 255), 1, cv2.LINE_AA)
    return image
