"""Pallas TPU kernels for the detection hot path.

Two kernels mandated by the north star (BASELINE.json:5):

1. **Fused decode + confidence scoring** (`decode_score_head`): consumes a
   raw head map and emits only what NMS needs — corner boxes, objectness,
   best-class score/id, ranking score.  The reference materializes the full
   (D, 5+C) decoded tensor and re-reads it repeatedly in write_results
   (SURVEY.md §3.2); this kernel reduces 85 columns to 8 in one VMEM pass
   (sigmoid grid offsets + exp anchor scaling + class max/argmax fused),
   ~10x less HBM traffic into postprocessing.

2. **Fixed-shape greedy NMS** (`nms_keep_pallas`): the K-candidate greedy
   suppression loop entirely in VMEM.  The jnp version (ops/nms.py) lowers
   to an XLA while-loop with per-iteration dynamic-slice/scatter overhead;
   here the (K, K) IoU matrix is computed on the VPU and the sequential
   keep-scan runs in on-chip memory.

Both have jnp reference implementations (`*_ref`) that are the test oracle
and the CPU fallback; `interpret=True` is used automatically off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelSpec, head_strides

_LANES = 128


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ===========================================================================
# 1. Fused decode + score
# ===========================================================================


def _decode_score_kernel(raw_ref, geom_ref, colid_ref, out_ref, *,
                         stride: int, num_classes: int, score_mode: str,
                         cls_act: str = "sigmoid", scale_xy: float = 1.0,
                         new_coords: bool = False):
    """One block of rows (cell-major, anchor-minor) of one head.

    raw_ref:   (1, block_rows, 5+C) raw logits
    geom_ref:  (1, block_rows, 4) precomputed per-row (cx, cy, pw, ph) —
               XLA-side constants; this Mosaic build rejects in-kernel
               iota->float casts, and the geometry is pure trace-time data
               anyway, so baking it costs one tiny extra VMEM stream.
    colid_ref: (1, 1, C) class-column indices as f32 (argmax helper)
    out_ref:   (1, block_rows, 8) = x1, y1, x2, y2, obj, cls_score, cls_id, rank
    """
    raw = raw_ref[0]
    geom = geom_ref[0]
    cx, cy = geom[:, 0:1], geom[:, 1:2]
    pw, ph = geom[:, 2:3], geom[:, 3:4]

    s = float(stride)
    # scale_xy: YOLOv4 grid sensitivity (1.0 = plain sigmoid + cx, v2/v3).
    # new_coords (Scaled-YOLOv4): the head conv already applied logistic to
    # every channel, so the kernel decodes pre-activated values — static
    # trace-time branch, no in-kernel control flow.
    al, sh = float(scale_xy), 0.5 * (float(scale_xy) - 1.0)
    if new_coords:
        bx = (raw[:, 0:1] * al - sh + cx) * s
        by = (raw[:, 1:2] * al - sh + cy) * s
        bw = pw * jnp.square(2.0 * raw[:, 2:3])
        bh = ph * jnp.square(2.0 * raw[:, 3:4])
        obj = raw[:, 4:5]
    else:
        bx = (jax.nn.sigmoid(raw[:, 0:1]) * al - sh + cx) * s
        by = (jax.nn.sigmoid(raw[:, 1:2]) * al - sh + cy) * s
        bw = pw * jnp.exp(raw[:, 2:3])
        bh = ph * jnp.exp(raw[:, 3:4])
        obj = jax.nn.sigmoid(raw[:, 4:5])
    cls_logit = raw[:, 5 : 5 + num_classes]
    cls_best = jnp.max(cls_logit, axis=1, keepdims=True)
    # argmax without int vectors: first column achieving the max
    col_f = colid_ref[0]  # (1, C) f32 arange, broadcasts over rows
    cls_id = jnp.min(
        jnp.where(cls_logit >= cls_best, col_f, float(num_classes)),
        axis=1, keepdims=True)
    if cls_act == "softmax":  # [region]: p(best) = 1 / Σ exp(l_i - l_best)
        cls_score = 1.0 / jnp.sum(
            jnp.exp(cls_logit - cls_best), axis=1, keepdims=True)
    elif cls_act == "linear":  # [region] softmax=0: raw logits
        cls_score = cls_best
    else:
        cls_score = jax.nn.sigmoid(cls_best)  # monotonic: max commutes

    rank = obj if score_mode == "obj" else obj * cls_score
    half_w, half_h = bw * 0.5, bh * 0.5
    out_ref[0] = jnp.concatenate(
        [bx - half_w, by - half_h, bx + half_w, by + half_h,
         obj, cls_score, cls_id, rank], axis=1)


def decode_score_head(
    raw: jnp.ndarray,
    anchors: tuple[tuple[float, float], ...],
    stride: int,
    num_classes: int,
    score_mode: str = "obj",
    interpret: bool | None = None,
    cls_act: str = "sigmoid",
    scale_xy: float = 1.0,
    new_coords: bool = False,
) -> jnp.ndarray:
    """(N, Gy, Gx, A*(5+C)) raw head -> (N, Gy*Gx*A, 8) fused decode+score rows.

    Columns: x1, y1, x2, y2 (net-input px corners), obj, cls_score,
    cls_id (as f32), rank.  Gy != Gx supported (rectangular net input).
    ``anchors`` must be in net-input pixels (region heads: pre-scale by
    stride — ops/decode.head_decode_args); ``cls_act`` as in decode_head."""
    n, gy, gx, ch = raw.shape
    a = len(anchors)
    attrs = 5 + num_classes
    assert ch == a * attrs
    rows = gy * gx * a
    flat = raw.reshape(n, rows, attrs)  # free reshape (row-major compatible)

    block_rows = min(_round_up(rows, 8), 1024)
    padded = _round_up(rows, block_rows)
    if padded != rows:
        flat = jnp.pad(flat, ((0, 0), (0, padded - rows), (0, 0)))

    # Per-row geometry (cx, cy, pw, ph), cell-major anchor-minor — trace-time
    # constant, shared across the batch.
    import numpy as np

    r = np.arange(padded)
    cell, anc_i = r // a, r % a
    anc = np.asarray(anchors, dtype=np.float32)
    geom = np.stack([
        (cell % gx).astype(np.float32),
        (cell // gx).astype(np.float32),
        anc[anc_i, 0],
        anc[anc_i, 1],
    ], axis=1)[None]  # (1, padded, 4)
    colid = np.arange(num_classes, dtype=np.float32).reshape(1, 1, num_classes)

    kernel = functools.partial(
        _decode_score_kernel, stride=stride, num_classes=num_classes,
        score_mode=score_mode, cls_act=cls_act, scale_xy=scale_xy,
        new_coords=new_coords)
    out = pl.pallas_call(
        kernel,
        grid=(n, padded // block_rows),
        in_specs=[
            pl.BlockSpec((1, block_rows, attrs), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows, 4), lambda b, i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_classes), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, 8), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, padded, 8), jnp.float32),
        interpret=(not _on_tpu()) if interpret is None else interpret,
    )(flat, jnp.asarray(geom), jnp.asarray(colid))
    return out[:, :rows]


def decode_score_head_ref(
    raw: jnp.ndarray,
    anchors: tuple[tuple[float, float], ...],
    stride: int,
    num_classes: int,
    score_mode: str = "obj",
    cls_act: str = "sigmoid",
    scale_xy: float = 1.0,
    new_coords: bool = False,
) -> jnp.ndarray:
    """jnp reference for :func:`decode_score_head` (same output contract)."""
    from .decode import decode_head

    dec = decode_head(raw, anchors, stride, num_classes, cls_act,
                      scale_xy=scale_xy, new_coords=new_coords)  # (N, R, 5+C)
    cx, cy, w, h = dec[..., 0], dec[..., 1], dec[..., 2], dec[..., 3]
    obj = dec[..., 4]
    cls_prob = dec[..., 5:]
    cls_score = jnp.max(cls_prob, axis=-1)
    cls_id = jnp.argmax(cls_prob, axis=-1).astype(jnp.float32)
    rank = obj if score_mode == "obj" else obj * cls_score
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
         obj, cls_score, cls_id, rank], axis=-1)


def decode_score_all(
    heads: tuple[jnp.ndarray, ...],
    spec: ModelSpec,
    input_size: int,
    score_mode: str = "obj",
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Fused decode+score over every head -> (N, D, 8)."""
    if use_pallas is None:
        use_pallas = _on_tpu()
    from .decode import head_decode_args

    fn = decode_score_head if use_pallas else decode_score_head_ref
    strides = head_strides(spec)
    outs = []
    for raw, h, s in zip(heads, spec.yolo_layers, strides):
        anchors, cls_act, sxy, nc = head_decode_args(h, s)
        outs.append(fn(raw, anchors, s, h.classes,
                       score_mode=score_mode, cls_act=cls_act, scale_xy=sxy,
                       new_coords=nc))
    return jnp.concatenate(outs, axis=1)


# ===========================================================================
# 2. Fixed-shape greedy NMS
# ===========================================================================


def _nms_kernel(boxes_ref, rank_ref, cls_ref, tri_ref, keep_ref, over_scratch,
                keep_s, kill_s, done_s, *,
                k: int, iou_thresh: float, class_wise: bool):
    """Greedy suppression over K score-sorted candidates, all in VMEM.

    Fixpoint formulation of greedy NMS (same keep-set, proven by the
    keep-set property tests): a candidate is KEPT iff every higher-ranked
    overlapping candidate is KILLED, KILLED iff some higher-ranked KEPT
    candidate overlaps it.  Each round applies the rule to every undecided
    candidate at once (two (1,K)x(K,K) matvecs), so live rounds = depth of
    the kept/killed dependency chain — a handful on real box sets — where
    the previous leader-election kernel ran one round per *kept* box (up to
    K when most candidates survive; it was the pipeline's second-largest
    stage at 4.6 ms/batch-16, PERF.md round 2).  The loop is a bounded fori
    (Mosaic while lowering hangs on this toolchain — measured, not assumed)
    with a done flag: once every candidate is decided the remaining rounds
    are predicated no-ops (``pl.when``).

    boxes_ref:  (1, K, 4) corner boxes
    rank_ref:   (1, K, 1) f32 strictly-decreasing positive ranks; <= 0 marks
                invalid (conf-filtered / padding) rows
    cls_ref:    (1, K, 1) f32 class ids (suppression masked to equal classes
                when ``class_wise``)
    tri_ref:    (K, K) f32 strict upper-triangle mask, tri[j, i] = 1 iff
                j < i (XLA-side constant: Mosaic rejects in-kernel
                iota->float casts — CLAUDE.md landmines)
    keep_ref:   (1, K, 1) f32 out
    over_scratch: (K, K) f32 binarized rank-masked overlap matrix
    keep_s/kill_s: (1, K) f32 VMEM state; done_s: (1,) i32 SMEM flag
    """
    b = boxes_ref[0]
    x1, y1, x2, y2 = b[:, 0:1], b[:, 1:2], b[:, 2:3], b[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (K, 1)
    ix1 = jnp.maximum(x1, x1.T)
    iy1 = jnp.maximum(y1, y1.T)
    ix2 = jnp.minimum(x2, x2.T)
    iy2 = jnp.minimum(y2, y2.T)
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    union = area + area.T - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    over = jnp.where(iou > iou_thresh, 1.0, 0.0)
    if class_wise:
        cls = cls_ref[0, :, 0].reshape(k, 1)
        over = over * jnp.where(jnp.abs(cls - cls.T) < 0.5, 1.0, 0.0)
    # over[j, i]: strictly higher-ranked j overlaps i
    over_scratch[:] = over * tri_ref[:]

    rank_row = rank_ref[0, :, 0].reshape(1, k)
    valid_row = jnp.where(rank_row > 0.0, 1.0, 0.0)
    keep_s[:] = jnp.zeros((1, k), jnp.float32)
    kill_s[:] = 1.0 - valid_row  # invalid rows: decided-dead, never block
    done_s[0] = 0

    def body(_, carry):
        @pl.when(done_s[0] == 0)
        def _():
            kept = keep_s[:]
            killed = kill_s[:]
            und = (1.0 - kept) * (1.0 - killed)
            m = jnp.max(und)

            @pl.when(m <= 0.0)
            def _():
                done_s[0] = 1

            @pl.when(m > 0.0)
            def _():
                ov = over_scratch[:]
                blocked = jnp.dot(1.0 - killed, ov,
                                  preferred_element_type=jnp.float32)
                kill_now = jnp.dot(kept, ov,
                                   preferred_element_type=jnp.float32)
                keep_s[:] = kept + und * (1.0 - jnp.minimum(blocked, 1.0))
                kill_s[:] = killed + und * jnp.minimum(kill_now, 1.0)

        return carry

    lax.fori_loop(0, k, body, 0)
    keep_ref[0] = keep_s[:].reshape(k, 1)


def nms_keep_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    cls_id: jnp.ndarray | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Batched greedy NMS keep mask.

    boxes: (N, K, 4) score-sorted corner boxes; valid: (N, K) bool;
    cls_id: optional (N, K) f32 class ids — when given, suppression is
    class-wise (only equal classes suppress each other).  Returns (N, K)
    bool keep mask — the same keep-set as
    :func:`pytorch_yolo_tpu.ops.nms.greedy_suppress` on the class-masked IoU.

    Candidates must already be sorted by descending score (they are: both
    callers feed ``lax.top_k`` output), so the kernel's strict ranking is
    simply the position: rank[i] = K - i for valid rows, 0 otherwise."""
    import numpy as np

    n, k, _ = boxes.shape
    kp = _round_up(k, _LANES)
    class_wise = cls_id is not None
    cls = cls_id.astype(jnp.float32) if class_wise else jnp.zeros(valid.shape, jnp.float32)
    if kp != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, kp - k), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, kp - k)))
        cls = jnp.pad(cls, ((0, 0), (0, kp - k)))

    pos_rank = jnp.asarray(
        np.arange(kp, 0, -1, dtype=np.float32).reshape(1, kp, 1))
    rank = jnp.where(valid[..., None], pos_rank, 0.0)
    # strict upper triangle (tri[j, i] = 1 iff j < i): rank-order mask,
    # precomputed host-side (in-kernel iota->float casts are rejected by
    # this Mosaic toolchain)
    tri = jnp.asarray(np.triu(np.ones((kp, kp), np.float32), 1))

    kernel = functools.partial(_nms_kernel, k=kp, iou_thresh=iou_thresh,
                               class_wise=class_wise)
    keep = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, kp, 4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, kp), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, kp, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kp, kp), jnp.float32),
            pltpu.VMEM((1, kp), jnp.float32),
            pltpu.VMEM((1, kp), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=(not _on_tpu()) if interpret is None else interpret,
    )(boxes, rank, cls[..., None], tri)
    return keep[:, :k, 0] > 0.5
