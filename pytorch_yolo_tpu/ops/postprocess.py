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


def unletterbox_boxes_dynamic(boxes: jnp.ndarray, geos: jnp.ndarray) -> jnp.ndarray:
    """Per-image (traced) un-letterboxing for heterogeneous source shapes.

    boxes: (N, K, 4); geos: (N, 5) rows [scale, pad_x, pad_y, orig_w, orig_h]
    as float32.  Same math as :func:`unletterbox_boxes` with the geometry as
    data instead of compile-time constants — one compiled pipeline serves
    every source resolution (host-letterbox path)."""
    scale = geos[:, 0:1]
    pad_x = geos[:, 1:2]
    pad_y = geos[:, 2:3]
    w0 = geos[:, 3:4]
    h0 = geos[:, 4:5]
    x1 = jnp.clip((boxes[..., 0] - pad_x) / scale, 0.0, w0)
    y1 = jnp.clip((boxes[..., 1] - pad_y) / scale, 0.0, h0)
    x2 = jnp.clip((boxes[..., 2] - pad_x) / scale, 0.0, w0)
    y2 = jnp.clip((boxes[..., 3] - pad_y) / scale, 0.0, h0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
