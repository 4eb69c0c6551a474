"""Map detections from net-input (letterboxed) pixels back to source images.

Replaces the reference's inline un-letterboxing in ``detect.py``
(SURVEY.md §2.1 #8): subtract the pad, divide by the scale, clamp to the
original image bounds.  Runs on device as part of the jitted pipeline so the
only D2H transfer is the final fixed-shape result tensor.
"""

from __future__ import annotations

import jax.numpy as jnp

from .preprocess import LetterboxGeometry


def unletterbox_boxes(boxes: jnp.ndarray, geo: LetterboxGeometry) -> jnp.ndarray:
    """(…, 4) x1,y1,x2,y2 in net-input pixels -> original-image pixels.

    Inverse of the letterbox placement; clamps to [0, W0] x [0, H0]
    (reference behavior, SURVEY.md §3.2)."""
    x1 = (boxes[..., 0] - geo.pad_x) / geo.scale
    y1 = (boxes[..., 1] - geo.pad_y) / geo.scale
    x2 = (boxes[..., 2] - geo.pad_x) / geo.scale
    y2 = (boxes[..., 3] - geo.pad_y) / geo.scale
    x1 = jnp.clip(x1, 0.0, float(geo.orig_w))
    x2 = jnp.clip(x2, 0.0, float(geo.orig_w))
    y1 = jnp.clip(y1, 0.0, float(geo.orig_h))
    y2 = jnp.clip(y2, 0.0, float(geo.orig_h))
    return jnp.stack([x1, y1, x2, y2], axis=-1)
