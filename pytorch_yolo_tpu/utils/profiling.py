"""Lightweight timing/throughput stats for the CLIs and bench harness.

Replaces the reference's ad-hoc ``time.time()`` prints (SURVEY.md §5.1) with
a small dependency-free stats struct; ``jax.profiler.trace`` integration for
Perfetto timelines hangs off the ``--profile`` CLI flag."""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class StageStats:
    name: str
    samples_ms: list[float] = dataclasses.field(default_factory=list)

    def add(self, seconds: float) -> None:
        self.samples_ms.append(seconds * 1e3)

    def summary(self) -> dict[str, float]:
        if not self.samples_ms:
            return {"count": 0}
        a = np.asarray(self.samples_ms)
        return {
            "count": int(a.size),
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p95_ms": float(np.percentile(a, 95)),
            "min_ms": float(a.min()),
            "max_ms": float(a.max()),
        }


class PipelineStats:
    """Per-stage latency percentiles + end-to-end throughput."""

    def __init__(self) -> None:
        self.stages: dict[str, StageStats] = {}
        self._t0: float | None = None
        self.items = 0

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        s = self.stages.setdefault(name, StageStats(name))
        t = time.perf_counter()
        try:
            yield
        finally:
            s.add(time.perf_counter() - t)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def count(self, n: int = 1) -> None:
        self.items += n

    def throughput(self) -> float:
        if self._t0 is None or self.items == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self.items / dt if dt > 0 else 0.0

    def report(self) -> str:
        lines = [f"items: {self.items}  throughput: {self.throughput():.2f}/s"]
        for name, s in self.stages.items():
            m = s.summary()
            if m.get("count"):
                lines.append(
                    f"  {name:<10} mean {m['mean_ms']:7.2f} ms  p50 {m['p50_ms']:7.2f}"
                    f"  p95 {m['p95_ms']:7.2f}  n={m['count']}"
                )
        return "\n".join(lines)


def profile_pipeline(detector, size: int = 416, batch: int = 8,
                     iters: int = 10, orig: tuple[int, int] = (480, 640),
                     conf: float = 0.6, iou: float = 0.45) -> list[dict]:
    """End-to-end pipeline cost split: letterbox / forward / decode / NMS.

    Times cumulative pipeline *prefixes* (each compiled separately, each
    reduced to a scalar so the D2H fetch that fences the timing doesn't
    dominate it) and differences them.  Same caveats as
    :func:`profile_stages` — prefix costs aren't strictly additive under XLA
    fusion; small negative deltas are noise."""
    import jax
    import jax.numpy as jnp

    from ..ops.nms import batched_nms_fused
    from ..ops.pallas_kernels import decode_score_all
    from ..ops.preprocess import letterbox_batch

    spec = detector.spec
    fwd = detector._forward
    use_pallas = detector.use_pallas
    score_mode = detector.score_mode
    interp = detector.interp

    def p_letterbox(params, imgs):
        return letterbox_batch(imgs, size=size, bgr=True, method=interp).sum()

    def p_forward(params, imgs):
        x = letterbox_batch(imgs, size=size, bgr=True, method=interp)
        # keep every head live (returning one would let XLA DCE the others)
        return sum(h.sum() for h in fwd(params, x))

    def p_decode(params, imgs):
        x = letterbox_batch(imgs, size=size, bgr=True, method=interp)
        rows = decode_score_all(tuple(fwd(params, x)), spec, size,
                                score_mode=score_mode, use_pallas=use_pallas)
        return rows.sum()

    def p_nms(params, imgs):
        x = letterbox_batch(imgs, size=size, bgr=True, method=interp)
        rows = decode_score_all(tuple(fwd(params, x)), spec, size,
                                score_mode=score_mode, use_pallas=use_pallas)
        res = batched_nms_fused(rows, conf_thresh=conf, iou_thresh=iou,
                                max_det=300, use_pallas=use_pallas)
        return res.boxes.sum() + res.valid.sum()

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(batch,) + orig + (3,),
                                    dtype=np.uint8))
    rows_out: list[dict] = []
    prev = 0.0
    for name, fn in (("letterbox", p_letterbox), ("+forward", p_forward),
                     ("+decode", p_decode), ("+nms", p_nms)):
        jfn = jax.jit(fn)
        np.asarray(jfn(detector.params, imgs))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(detector.params, imgs)
        np.asarray(out)
        cum = (time.perf_counter() - t0) / iters * 1e3
        rows_out.append({"stage": name, "cum_ms": round(cum, 3),
                         "delta_ms": round(cum - prev, 3),
                         "img_per_s": round(batch / (cum / 1e3), 1)})
        prev = cum
    return rows_out


def stage_cut_points(spec) -> list[tuple[int, str]]:
    """(layer_index, label) after each spatial-resolution change + each head.

    These are the natural cost boundaries of a Darknet backbone: every
    stride-changing layer starts a new stage whose per-stage time the
    profiler isolates by differencing cumulative-prefix timings."""
    from ..config import (ConvSpec, MaxPoolSpec, RegionSpec, ReorgSpec,
                          UpsampleSpec, YoloSpec)

    cuts: list[tuple[int, str]] = []
    stride = 1
    last_stage_start = 0
    for layer in spec.layers:
        changed = (isinstance(layer, (ConvSpec, MaxPoolSpec, ReorgSpec))
                   and layer.stride > 1) or isinstance(layer, UpsampleSpec)
        if changed and layer.index > 0:
            cuts.append((layer.index - 1, f"stride{stride} stage"))
            last_stage_start = layer.index
        if isinstance(layer, (ConvSpec, MaxPoolSpec, ReorgSpec)):
            stride *= layer.stride
        elif isinstance(layer, UpsampleSpec):
            stride //= layer.stride
        if isinstance(layer, (YoloSpec, RegionSpec)):
            cuts.append((layer.index, f"head@{layer.index}"))
            last_stage_start = layer.index + 1
    if not cuts or cuts[-1][0] != len(spec.layers) - 1:
        cuts.append((len(spec.layers) - 1, "tail"))
    # dedupe while keeping order (a head can directly precede a downsample)
    seen: set[int] = set()
    return [(i, n) for i, n in cuts if not (i in seen or seen.add(i))]


def profile_stages(detector, size: int = 416, batch: int = 8,
                   iters: int = 10, cuts: "list[tuple[int, str]] | None" = None,
                   ) -> list[dict]:
    """Per-stage forward cost via cumulative-prefix timing (PERF.md #4).

    Compiles one truncated forward per cut point (bounded: ~#downsamples +
    #heads) and reports ``delta_ms`` = cost of the layers between consecutive
    cuts.  Every timing ends in a real D2H fetch — ``jax.block_until_ready``
    is not a fence on the tunneled TPU runtime (CLAUDE.md).  Negative deltas
    (XLA fuses across cut boundaries, so prefix cost is not strictly
    additive) are reported as measured; treat small ones as noise."""
    import jax.numpy as jnp
    import numpy as np

    from ..models.darknet import build_forward

    spec = detector.spec
    cuts = cuts or stage_cut_points(spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, size, size, 3)).astype(np.float32))
    rows: list[dict] = []
    prev_ms = 0.0
    # mirror the detector's serving configuration (dtype/precision/quant)
    kw = dict(
        compute_dtype=getattr(detector, "compute_dtype", jnp.float32),
        precision=getattr(detector, "precision", "highest"),
        quant=getattr(detector, "quant", None),
        stem_s2d=getattr(detector, "stem_s2d", False),
    )
    import jax

    for idx, label in cuts:
        raw = build_forward(spec, stop_at=idx, **kw)

        # Reduce every output to one scalar ON DEVICE: fetching the truncated
        # activations themselves (e.g. 177 MB for the stem at batch 16) costs
        # seconds over the tunneled link and swamps the compute being measured
        # (observed in the round-2 harvest).  Summing all outputs also keeps
        # XLA from dead-code-eliminating any of them.
        def fn_scalar(params, xx, _raw=raw):
            outs = _raw(params, xx)
            return sum(o.astype(jnp.float32).sum() for o in outs)

        fn = jax.jit(fn_scalar)
        np.asarray(fn(detector.params, x))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(detector.params, x)
        np.asarray(out)
        cum_ms = (time.perf_counter() - t0) / iters * 1e3
        rows.append({"layer": idx, "stage": label,
                     "cum_ms": round(cum_ms, 3),
                     "delta_ms": round(cum_ms - prev_ms, 3)})
        prev_ms = cum_ms
    return rows
