"""Independent torch-CPU oracle implementing the reference semantics.

SURVEY.md §4.2: the reference repo has no test suite and the mount is empty,
so parity is checked against this **independent implementation** of the
[B]-tier documented semantics (Darknet forward math, YOLO decode, greedy NMS,
letterbox arithmetic) written with torch/numpy in the reference's native
conventions (NCHW, OIHW, dynamic shapes, Python loops).  It deliberately
shares *no* compute code with the JAX framework — only the cfg parser data
model, since the format is the interchange point.

This is a test oracle, not product code (SURVEY.md §4.2.1 note).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from pytorch_yolo_tpu.config import (
    ConvSpec,
    MaxPoolSpec,
    ModelSpec,
    RegionSpec,
    ReorgSpec,
    RouteSpec,
    ShortcutSpec,
    UpsampleSpec,
    YoloSpec,
    head_strides,
)

BN_EPS = 1e-5


# ---------------------------------------------------------------------------
# Independent .weights stream reader (cross-checks pytorch_yolo_tpu.weights)
# ---------------------------------------------------------------------------


def read_weights_oracle(spec: ModelSpec, path: str) -> dict[int, dict[str, np.ndarray]]:
    """Parse Darknet .weights into torch-convention OIHW tensors."""
    with open(path, "rb") as f:
        header = np.fromfile(f, dtype=np.int32, count=3)
        major, minor, _ = header
        if major * 10 + minor >= 2:
            np.fromfile(f, dtype=np.uint64, count=1)
        else:
            np.fromfile(f, dtype=np.int32, count=1)
        flat = np.fromfile(f, dtype=np.float32)

    params: dict[int, dict[str, np.ndarray]] = {}
    ptr = 0
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec):
            continue
        o, i, k = layer.filters, layer.in_channels, layer.size
        entry: dict[str, np.ndarray] = {}
        if layer.batch_normalize:
            for key in ("bn_beta", "bn_gamma", "bn_mean", "bn_var"):
                entry[key] = flat[ptr : ptr + o].copy()
                ptr += o
        else:
            entry["b"] = flat[ptr : ptr + o].copy()
            ptr += o
        n = o * i * k * k
        entry["w_oihw"] = flat[ptr : ptr + n].reshape(o, i, k, k).copy()
        ptr += n
        params[layer.index] = entry
    assert ptr == flat.size, (ptr, flat.size)
    return params


def raw_to_oracle(raw: dict[int, dict[str, np.ndarray]]) -> dict[int, dict[str, np.ndarray]]:
    """Convert the framework's raw HWIO pytree to oracle OIHW layout."""
    out: dict[int, dict[str, np.ndarray]] = {}
    for idx, entry in raw.items():
        e = {k: np.asarray(v) for k, v in entry.items() if k != "w"}
        e["w_oihw"] = np.ascontiguousarray(np.asarray(entry["w"]).transpose(3, 2, 0, 1))
        out[idx] = e
    return out


# ---------------------------------------------------------------------------
# Reference-convention forward (NCHW, un-folded BN, per-layer output cache)
# ---------------------------------------------------------------------------


@torch.no_grad()
def reorg_oracle(x_nchw: np.ndarray, stride: int) -> np.ndarray:
    """Darknet reorg_cpu (reorg_layer.c, forward=0 branch), literal index math.

    out[b, k, j, i] (flat NCHW (C, H, W) order, later consumed as
    (C*s², H/s, W/s)) = view[b, k % C', j*s + (k//C')//s, i*s + (k//C')%s]
    where view is x's flat buffer as (C' = C/s², H*s, W*s).  Implemented with
    the loop indices of the C code (vectorized), NOT reshape/transpose
    algebra, so it is an independent check of models/darknet._reorg."""
    n, c, h, w = x_nchw.shape
    s = stride
    oc = c // (s * s)
    view = np.ascontiguousarray(x_nchw).reshape(n, oc, h * s, w * s)
    k, j, i = np.meshgrid(np.arange(c), np.arange(h), np.arange(w), indexing="ij")
    c2 = k % oc
    offset = k // oc
    w2 = i * s + offset % s
    h2 = j * s + offset // s
    out = view[:, c2, h2, w2]  # (n, c, h, w) gathered per the C loop
    return out.reshape(n, c * s * s, h // s, w // s)


def forward_oracle(
    spec: ModelSpec,
    params: dict[int, dict[str, np.ndarray]],
    x_nchw: np.ndarray,
    return_all: bool = False,
):
    """Run the Darknet forward in torch, mirroring the reference block-walk
    (SURVEY.md §3.3).  Returns per-head raw maps (N, A*(5+C), G, G) —
    or every layer output when ``return_all``."""
    x = torch.from_numpy(np.ascontiguousarray(x_nchw)).float()
    outputs: dict[int, torch.Tensor] = {}
    heads: list[torch.Tensor] = []
    for layer in spec.layers:
        if isinstance(layer, ConvSpec):
            p = params[layer.index]
            w = torch.from_numpy(p["w_oihw"]).float()
            bias = None if layer.batch_normalize else torch.from_numpy(p["b"]).float()
            x = F.conv2d(x, w, bias, stride=layer.stride, padding=layer.padding)
            if layer.batch_normalize:
                x = F.batch_norm(
                    x,
                    torch.from_numpy(p["bn_mean"]).float(),
                    torch.from_numpy(p["bn_var"]).float(),
                    torch.from_numpy(p["bn_gamma"]).float(),
                    torch.from_numpy(p["bn_beta"]).float(),
                    training=False,
                    eps=BN_EPS,
                )
            if layer.activation == "leaky":
                x = F.leaky_relu(x, 0.1)
            elif layer.activation == "mish":
                x = x * torch.tanh(F.softplus(x))
            elif layer.activation == "relu":
                x = F.relu(x)
            elif layer.activation == "logistic":
                x = torch.sigmoid(x)
        elif isinstance(layer, MaxPoolSpec):
            total = layer.size - 1
            lo, hi = total // 2, total - total // 2
            x = F.pad(x, (lo, hi, lo, hi), value=float("-inf"))
            x = F.max_pool2d(x, layer.size, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            x = F.interpolate(x, scale_factor=layer.stride, mode="nearest")
        elif isinstance(layer, RouteSpec):
            srcs = [outputs[j] for j in layer.layers]
            if layer.groups > 1:  # CSP split route (YOLOv4-tiny)
                srcs = [t.chunk(layer.groups, dim=1)[layer.group_id] for t in srcs]
            x = srcs[0] if len(srcs) == 1 else torch.cat(srcs, dim=1)
        elif isinstance(layer, ShortcutSpec):
            x = outputs[layer.index - 1] + outputs[layer.from_layer]
        elif isinstance(layer, ReorgSpec):
            x = torch.from_numpy(reorg_oracle(x.numpy(), layer.stride))
        elif isinstance(layer, (YoloSpec, RegionSpec)):
            heads.append(x.clone())
        outputs[layer.index] = x
    if return_all:
        return {i: t.numpy() for i, t in outputs.items()}
    return [h.numpy() for h in heads]


# ---------------------------------------------------------------------------
# Reference-convention decode (predict_transform, SURVEY.md §2.1 #5)
# ---------------------------------------------------------------------------


def decode_oracle(
    raw_nchw: np.ndarray,
    anchors: tuple[tuple[float, float], ...],
    stride: int,
    num_classes: int,
    cls_act: str = "sigmoid",
    scale_xy: float = 1.0,
    new_coords: bool = False,
) -> np.ndarray:
    """NCHW raw map -> (N, Gy*Gx*A, 5+C), the reference view/transpose order.

    ``new_coords`` (Scaled-YOLOv4 dialect): the head conv already applied
    logistic over all channels, so decode skips its own sigmoid/exp:
    xy = (t * scale - (scale-1)/2 + grid) * stride, wh = (2t)^2 * anchor,
    obj/cls pass through (callers pair with ``cls_act="linear"``)."""
    n, ch, gy, gx = raw_nchw.shape
    a = len(anchors)
    attrs = 5 + num_classes
    assert ch == a * attrs
    p = torch.from_numpy(np.array(raw_nchw)).float()
    # (N, A*attrs, Gy*Gx) -> (N, Gy*Gx, A*attrs) -> (N, Gy*Gx*A, attrs)
    p = p.reshape(n, a * attrs, gy * gx).transpose(1, 2).reshape(n, gy * gx * a, attrs)

    cx, cy = np.meshgrid(np.arange(gx, dtype=np.float32),
                         np.arange(gy, dtype=np.float32))  # cx varies along columns
    offs = np.stack([cx.reshape(-1), cy.reshape(-1)], axis=-1)  # (Gy*Gx, 2)
    offs = np.repeat(offs, a, axis=0)[None]  # cell-major, anchor-minor

    out = p.clone()
    # YOLOv4 grid sensitivity: bx = (a*sigma(tx) - (a-1)/2 + cx) * stride
    txy = p[..., 0:2] if new_coords else torch.sigmoid(p[..., 0:2])
    out[..., 0:2] = (
        txy * scale_xy - 0.5 * (scale_xy - 1.0) + torch.from_numpy(offs)
    ) * stride
    anc = torch.tensor(anchors, dtype=torch.float32)  # (A, 2)
    anc_tiled = anc.repeat(gy * gx, 1)[None]  # (1, Gy*Gx*A, 2)
    if new_coords:
        out[..., 2:4] = anc_tiled * (2.0 * p[..., 2:4]) ** 2
        out[..., 4:5] = p[..., 4:5]
    else:
        out[..., 2:4] = anc_tiled * torch.exp(p[..., 2:4])
        out[..., 4:5] = torch.sigmoid(p[..., 4:5])
    if cls_act == "softmax":
        out[..., 5:] = torch.softmax(p[..., 5:], dim=-1)
    elif cls_act == "linear":
        out[..., 5:] = p[..., 5:]
    else:
        out[..., 5:] = torch.sigmoid(p[..., 5:])
    return out.numpy()


def decode_all_oracle(spec: ModelSpec, heads_nchw: list[np.ndarray], input_size: int) -> np.ndarray:
    outs = []
    for raw, head, stride in zip(heads_nchw, spec.yolo_layers, head_strides(spec)):
        if isinstance(head, RegionSpec):  # grid-unit anchors, softmax classes
            anchors = tuple((w * stride, h * stride) for w, h in head.anchors)
            cls_act, sxy, nc = ("softmax" if head.softmax else "linear"), 1.0, False
        elif head.new_coords:  # Scaled-YOLOv4: pre-activated, cls passthrough
            anchors, cls_act, sxy, nc = head.anchors, "linear", head.scale_x_y, True
        else:
            anchors, cls_act, sxy, nc = head.anchors, "sigmoid", head.scale_x_y, False
        outs.append(decode_oracle(raw, anchors, stride, head.classes, cls_act,
                                  scale_xy=sxy, new_coords=nc))
    return np.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Reference-convention NMS (dynamic shapes, Python loops, SURVEY.md §3.2)
# ---------------------------------------------------------------------------


def iou_xyxy(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    a1 = np.clip(box[2] - box[0], 0, None) * np.clip(box[3] - box[1], 0, None)
    a2 = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    union = a1 + a2 - inter
    return np.where(union > 0, inter / union, 0.0)


def nms_oracle(
    det: np.ndarray,
    conf_thresh: float,
    iou_thresh: float,
    score_mode: str = "obj",
    class_agnostic: bool = False,
) -> np.ndarray:
    """Dynamic-shape class-wise greedy NMS over (D, 5+C) decoded rows.

    Returns (M, 7) [x1, y1, x2, y2, obj, cls_score, cls_id] sorted by
    descending ranking score — the reference ``write_results`` output shape
    (SURVEY.md §1 L4)."""
    obj = det[:, 4]
    mask = obj > conf_thresh
    d = det[mask]
    if d.size == 0:
        return np.zeros((0, 7), dtype=np.float32)
    cls_prob = d[:, 5:]
    cls_id = cls_prob.argmax(axis=1)
    cls_score = cls_prob.max(axis=1)
    rank = d[:, 4] if score_mode == "obj" else d[:, 4] * cls_score

    boxes = np.stack(
        [d[:, 0] - d[:, 2] / 2, d[:, 1] - d[:, 3] / 2,
         d[:, 0] + d[:, 2] / 2, d[:, 1] + d[:, 3] / 2], axis=1)

    keep_rows: list[np.ndarray] = []
    classes = [0] if class_agnostic else np.unique(cls_id)
    for c in classes:
        sel = np.ones(len(d), dtype=bool) if class_agnostic else cls_id == c
        b, r = boxes[sel], rank[sel]
        o, cs, ci = d[sel, 4], cls_score[sel], cls_id[sel]
        order = np.argsort(-r, kind="stable")
        kept: list[int] = []
        for i in order:
            if not kept or iou_xyxy(b[i], b[np.array(kept)]).max() <= iou_thresh:
                kept.append(i)
        for i in kept:
            keep_rows.append(np.array([*b[i], o[i], cs[i], ci[i]], dtype=np.float32))
    if not keep_rows:
        return np.zeros((0, 7), dtype=np.float32)
    out = np.stack(keep_rows)
    srt = np.argsort(-(out[:, 4] if score_mode == "obj" else out[:, 4] * out[:, 5]),
                     kind="stable")
    return out[srt]


# ---------------------------------------------------------------------------
# Letterbox oracle (numpy bilinear, half-pixel centers, no antialias)
# ---------------------------------------------------------------------------


def bilinear_resize_oracle(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-center bilinear resize, float32, no antialias — the
    documented convention (SURVEY.md §7 hard parts)."""
    in_h, in_w = img.shape[:2]
    x = img.astype(np.float64)
    sy, sx = in_h / out_h, in_w / out_w
    ys = (np.arange(out_h) + 0.5) * sy - 0.5
    xs = (np.arange(out_w) + 0.5) * sx - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    wy = ys - y0
    wx = xs - x0
    y0c = np.clip(y0, 0, in_h - 1)
    y1c = np.clip(y0 + 1, 0, in_h - 1)
    x0c = np.clip(x0, 0, in_w - 1)
    x1c = np.clip(x0 + 1, 0, in_w - 1)
    top = x[y0c][:, x0c] * (1 - wx)[None, :, None] + x[y0c][:, x1c] * wx[None, :, None]
    bot = x[y1c][:, x0c] * (1 - wx)[None, :, None] + x[y1c][:, x1c] * wx[None, :, None]
    return (top * (1 - wy)[:, None, None] + bot * wy[:, None, None]).astype(np.float32)


def letterbox_oracle(img: np.ndarray, size: int, bgr: bool = True, fill: float = 128.0) -> np.ndarray:
    h0, w0 = img.shape[:2]
    scale = min(size / w0, size / h0)
    nw, nh = int(w0 * scale), int(h0 * scale)
    x = img.astype(np.float32)
    if bgr:
        x = x[..., ::-1]
    r = bilinear_resize_oracle(x, nh, nw)
    canvas = np.full((size, size, 3), fill, dtype=np.float32)
    py, px = (size - nh) // 2, (size - nw) // 2
    canvas[py : py + nh, px : px + nw] = r
    return canvas / 255.0
