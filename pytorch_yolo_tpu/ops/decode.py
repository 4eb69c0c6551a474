"""YOLO detection-head decode: raw feature maps -> anchor boxes.

Replaces the reference's ``predict_transform`` (SURVEY.md §2.1 #5, §3.3).
Decode math ([B]-tier, YOLOv3 paper §2.1 / SURVEY.md §3.3):

    bx = (sigmoid(tx) + cx) * stride      bw = pw * exp(tw)
    by = (sigmoid(ty) + cy) * stride      bh = ph * exp(th)
    obj = sigmoid(to)
    p(class_i) = sigmoid(ti)              # independent sigmoids, NOT softmax

Anchors (pw, ph) are in net-input pixels.  Output detections are ordered
cell-major, anchor-minor per head, heads concatenated in network order —
matching the reference's ``view/transpose`` reshuffle so decoded tensors are
comparable element-for-element in the parity tests.

Two implementations:
  * :func:`decode_head` — pure jnp.  XLA already fuses this into a single
    elementwise pass over the head output; it is the correctness oracle.
  * :func:`decode_head_pallas` (ops/pallas_kernels.py) — fused Pallas kernel
    combining decode + score computation, used on TPU for the hot path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from ..config import ModelSpec, RegionSpec, YoloSpec, head_strides


def head_decode_args(head: "YoloSpec | RegionSpec", stride: int):
    """(anchors in net-input px, class activation, scale_x_y, new_coords).

    [yolo] anchors are already in pixels with sigmoid class scores; [region]
    anchors are in grid-cell units (scaled by the head stride here) with a
    softmax over classes (raw logits when the cfg sets softmax=0).
    ``scale_x_y`` is the YOLOv4 grid-sensitivity factor (1.0 for v2/v3).
    ``new_coords`` ([yolo] only — Scaled-YOLOv4) selects the pre-activated
    decode; class scores then pass through ("linear": the preceding
    logistic conv already applied the sigmoid)."""
    if isinstance(head, RegionSpec):
        anchors = tuple((w * stride, h * stride) for w, h in head.anchors)
        return anchors, ("softmax" if head.softmax else "linear"), 1.0, False
    if head.new_coords:
        return head.anchors, "linear", head.scale_x_y, True
    return head.anchors, "sigmoid", head.scale_x_y, False


def _grid_offsets(gy: int, gx: int, dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(gy, gx) arrays of column (cx) and row (cy) indices."""
    cx = lax.broadcasted_iota(dtype, (gy, gx), 1)
    cy = lax.broadcasted_iota(dtype, (gy, gx), 0)
    return cx, cy


def decode_head(
    raw: jnp.ndarray,
    anchors: tuple[tuple[float, float], ...],
    stride: int,
    num_classes: int,
    cls_act: str = "sigmoid",
    scale_xy: float = 1.0,
    new_coords: bool = False,
) -> jnp.ndarray:
    """Decode one head's raw (N, Gy, Gx, A*(5+C)) map to (N, Gy*Gx*A, 5+C).

    Returns [bx, by, bw, bh, obj, p0..pC-1] with box centers/sizes in
    net-input pixels, fp32.  Gy != Gx supported (rectangular net input).
    ``cls_act``: "sigmoid" ([yolo]), "softmax" or "linear" ([region]).
    ``scale_xy`` widens the center offsets (YOLOv4 grid sensitivity):
    ``bx = (scale * sigmoid(tx) - 0.5 * (scale - 1) + cx) * stride``.
    ``new_coords`` (Scaled-YOLOv4): inputs were already sigmoid-activated
    by the head conv (activation=logistic), so decode drops its own
    sigmoid/exp — ``bx = (tx * scale - 0.5 * (scale - 1) + cx) * stride``,
    ``bw = (2 * tw)^2 * pw``, obj passes through (callers pair this with
    ``cls_act="linear"``)."""
    n, gy, gx, ch = raw.shape
    a = len(anchors)
    c = num_classes
    assert ch == a * (5 + c), (raw.shape, anchors, num_classes)

    x = raw.reshape(n, gy, gx, a, 5 + c).astype(jnp.float32)
    cx, cy = _grid_offsets(gy, gx)

    al, sh = float(scale_xy), 0.5 * (float(scale_xy) - 1.0)
    txy0 = x[..., 0] if new_coords else lax.logistic(x[..., 0])
    txy1 = x[..., 1] if new_coords else lax.logistic(x[..., 1])
    bx = (txy0 * al - sh + cx[None, :, :, None]) * float(stride)
    by = (txy1 * al - sh + cy[None, :, :, None]) * float(stride)
    pw = jnp.asarray([w for w, _ in anchors], dtype=jnp.float32)
    ph = jnp.asarray([h for _, h in anchors], dtype=jnp.float32)
    if new_coords:
        bw = pw[None, None, None, :] * jnp.square(2.0 * x[..., 2])
        bh = ph[None, None, None, :] * jnp.square(2.0 * x[..., 3])
        obj = x[..., 4]
    else:
        bw = pw[None, None, None, :] * jnp.exp(x[..., 2])
        bh = ph[None, None, None, :] * jnp.exp(x[..., 3])
        obj = lax.logistic(x[..., 4])
    if cls_act == "softmax":
        cls = jax.nn.softmax(x[..., 5:], axis=-1)
    elif cls_act == "linear":
        cls = x[..., 5:]
    else:
        cls = lax.logistic(x[..., 5:])

    out = jnp.concatenate(
        [bx[..., None], by[..., None], bw[..., None], bh[..., None], obj[..., None], cls],
        axis=-1,
    )
    # cell-major, anchor-minor flatten (reference detection order, SURVEY.md §3.3)
    return out.reshape(n, gy * gx * a, 5 + c)


def decode_all(
    heads: tuple[jnp.ndarray, ...],
    spec: ModelSpec,
    input_size: int,
) -> jnp.ndarray:
    """Decode and concatenate every head: -> (N, D, 5+C).

    D = 10647 for full YOLOv3 @416, 2535 for tiny (SURVEY.md §3.3)."""
    strides = head_strides(spec)
    outs = []
    for raw, head_spec, stride in zip(heads, spec.yolo_layers, strides):
        anchors, cls_act, sxy, nc = head_decode_args(head_spec, stride)
        outs.append(decode_head(raw, anchors, stride, head_spec.classes,
                                cls_act, scale_xy=sxy, new_coords=nc))
    return jnp.concatenate(outs, axis=1)
