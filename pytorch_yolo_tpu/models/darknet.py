"""Pure-functional Darknet forward pass, compiled end-to-end by XLA.

Replaces the reference's ``Darknet(nn.Module).forward`` block-walk
(SURVEY.md §2.1 #3, §3.3).  Differences are deliberate and TPU-first:

  * **Pure function of (params, x)** — no module state; the whole network is
    one traced XLA program, so all ~75 convs fuse/schedule as a unit.
  * **NHWC activations, HWIO kernels** — the native TPU conv layout; the
    reference's NCHW is a CUDA convention with no benefit on the MXU.
  * **Static topology** — route/shortcut indices were resolved at parse time
    (config.build_spec), so tracing is a straight-line loop over specs with
    a Python-side dict of cached outputs.  Only outputs later referenced by
    a route/shortcut are retained.
  * **BN already folded into conv** (weights.fold_batchnorm), so a layer is
    exactly conv + bias + leaky_relu — XLA fuses bias+activation into the
    conv epilogue.
  * Optional **bf16 compute** (params cast at trace time, fp32 accumulation
    via ``preferred_element_type``) for MXU throughput; fp32 is the default
    for bit-faithful parity with the reference.

The forward returns the raw per-head feature maps (N, H, W, A*(5+C)); decode
to boxes lives in ``ops/decode.py`` so it can be fused with filtering.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..config import (
    ConvSpec,
    MaxPoolSpec,
    ModelSpec,
    RegionSpec,
    ReorgSpec,
    RouteSpec,
    ShortcutSpec,
    UpsampleSpec,
    YoloSpec,
)

_CONV_DIMS = ("NHWC", "HWIO", "NHWC")


def apply_activation(y: jnp.ndarray, activation: str) -> jnp.ndarray:
    """Darknet conv activations (config.CONV_ACTIVATIONS).

    ``leaky`` slope is exactly 0.1 (SURVEY.md §7 hard parts); ``mish`` is
    ``x * tanh(softplus(x))`` (YOLOv4 backbone, arXiv 2004.10934) with the
    numerically-stable softplus ``log1p(exp(-|x|)) + max(x, 0)`` so large
    positive logits don't overflow ``exp``."""
    if activation == "leaky":
        return jnp.where(y > 0, y, 0.1 * y)
    if activation == "mish":
        sp = jnp.log1p(jnp.exp(-jnp.abs(y))) + jnp.maximum(y, 0.0)
        return y * jnp.tanh(sp)
    if activation == "relu":
        return jnp.maximum(y, 0.0)
    if activation == "logistic":
        # Scaled-YOLOv4 head convs: sigmoid over ALL channels (pairs with
        # [yolo] new_coords=1, which then decodes without its own sigmoid).
        return jax.nn.sigmoid(y)
    return y  # linear


def _needed_outputs(spec: ModelSpec) -> frozenset[int]:
    """Layer indices whose outputs are consumed by a later route/shortcut."""
    needed: set[int] = set()
    for layer in spec.layers:
        if isinstance(layer, RouteSpec):
            needed.update(layer.layers)
        elif isinstance(layer, ShortcutSpec):
            needed.add(layer.from_layer)
            needed.add(layer.index - 1)
    return frozenset(needed)


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, spec: ConvSpec,
          compute_dtype: jnp.dtype, precision: lax.Precision) -> jnp.ndarray:
    p = spec.padding
    # Accumulate in >= fp32 (fp32 for bf16/fp32 compute; fp64 stays fp64 —
    # the f64 path exists so tests can pin transform exactness).
    acc = jnp.promote_types(jnp.float32, compute_dtype)
    y = lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(spec.stride, spec.stride),
        padding=((p, p), (p, p)),
        dimension_numbers=_CONV_DIMS,
        preferred_element_type=acc,
        precision=precision,
    )
    y = apply_activation(y + b.astype(acc), spec.activation)
    return y.astype(compute_dtype) if compute_dtype != jnp.dtype(acc) else y


def _maxpool(x: jnp.ndarray, spec: MaxPoolSpec) -> jnp.ndarray:
    """Darknet maxpool: total pad = size-1, split (floor, rest), -inf fill.

    This reproduces Darknet's ``out = (w + pad - size)/stride + 1`` with
    ``offset = -pad/2`` (C integer division) — including the tiny-YOLOv3
    size=2,stride=1 layer that must keep 13x13 via a trailing-only pad
    (SURVEY.md §7 hard parts).  -inf fill means padded cells never win the
    max, matching Darknet's -FLT_MAX initialization."""
    total = spec.size - 1
    lo = total // 2
    hi = total - lo
    # int8-resident inputs (ops/quant.int8_resident_chains) pad with the
    # integer minimum instead of -inf; max commutes with the monotone
    # quantizer, so the pooled int8 value is exactly the quantized pooled
    # fp value.  A window never lies fully in padding (total pad = size-1),
    # so the pad value itself can never be selected.
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = jnp.array(-jnp.inf, dtype=x.dtype)
    else:
        neg = jnp.array(jnp.iinfo(x.dtype).min, dtype=x.dtype)
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, spec.size, spec.size, 1),
        window_strides=(1, spec.stride, spec.stride, 1),
        padding=((0, 0), (lo, hi), (lo, hi), (0, 0)),
    )


def _reorg(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Darknet [reorg] (YOLOv2 passthrough): NHWC (N,H,W,C) -> (N,H/s,W/s,C*s²).

    Reproduces Darknet's reorg_cpu(forward=0) *exactly*, including its famous
    channel shuffle (config.ReorgSpec documents the semantics): the NCHW flat
    buffer is reinterpreted as (C/s², H*s, W*s), gathered as
    out[k, j, i] = view[k % C', j*s + (k//C')//s, i*s + (k//C')%s], and the
    (C, H, W)-shaped result is reinterpreted as (C*s², H/s, W/s).  Upstream
    yolov2 .weights were trained against this shuffle, so a "clean"
    space-to-depth would silently break them.  As reshape/transpose algebra
    (all layout moves, zero FLOPs — XLA fuses them into neighbors):

        view  = x_nchw.reshape(N, C/s², H*s, W*s)      # flat reinterpret
        six   = view.reshape(N, C/s², H, s, W, s)
        out   = six.transpose(0, 3, 5, 1, 2, 4)        # (N, sy, sx, C/s², H, W)
                  .reshape(N, C*s², H/s, W/s)          # flat reinterpret
    """
    n, h, w, c = x.shape
    s = stride
    xc = jnp.transpose(x, (0, 3, 1, 2))  # darknet semantics are NCHW-flat
    view = xc.reshape(n, c // (s * s), h * s, w * s)
    six = view.reshape(n, c // (s * s), h, s, w, s)
    out = jnp.transpose(six, (0, 3, 5, 1, 2, 4)).reshape(n, c * s * s, h // s, w // s)
    return jnp.transpose(out, (0, 2, 3, 1))


def _upsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Nearest-neighbor upsample via reshape+broadcast (no gather, XLA-friendly)."""
    n, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, stride, w, stride, c))
    return y.reshape(n, h * stride, w * stride, c)


def _stem_pattern(spec: ModelSpec) -> str | None:
    """Which space-to-depth re-parameterization the model's stem admits.

    ``"conv_conv"``: 3x3/s1 conv + 3x3/s2 conv (Darknet-53 — yolov3/spp).
    ``"conv_pool"``: 3x3/s1 conv + 2x2/s2 maxpool (tiny/v2 family) — the
    maxpool becomes a free max over the 4 phase channel groups.
    ``None``: stem not transformable (or layer 0's output is routed to)."""
    layers = spec.layers
    if len(layers) < 2 or 0 in _needed_outputs(spec):
        return None
    l0, l1 = layers[0], layers[1]
    if not (isinstance(l0, ConvSpec) and l0.size == 3 and l0.stride == 1
            and l0.padding == 1 and l0.activation == "leaky"):
        return None
    if (isinstance(l1, ConvSpec) and l1.size == 3 and l1.stride == 2
            and l1.padding == 1 and l1.activation == "leaky"):
        return "conv_conv"
    if isinstance(l1, MaxPoolSpec) and l1.size == 2 and l1.stride == 2:
        return "conv_pool"
    return None


def stem_s2d_applicable(spec: ModelSpec) -> bool:
    """True when :func:`build_forward(stem_s2d=True)` can re-parameterize
    the model's stem (see :func:`_stem_pattern`)."""
    return _stem_pattern(spec) is not None


def _pack_s2d_conv0(w0: jnp.ndarray, b0: jnp.ndarray):
    """3x3/s1 conv -> 3x3 block-space conv over S2D input.

    The exact space-to-depth stem re-parameterization (MLPerf-ResNet trick
    adapted to Darknet stems, PERF.md roadmap #3): the 3->32-channel 3x3
    conv at full 416² resolution has a contraction dim of 27 and 32 output
    channels — <25% of an MXU tile in both directions.  In 2x2-block space:

      * input (N, H, W, 3) -> (N, H/2, W/2, 12), channel = (dy, dx, c);
      * conv0 becomes a 3x3 conv over 12 -> 4*O0 channels, output channel
        = (a, b, o) for output phase (a, b) — output pixel (2i+a, 2j+b)
        tap (r, s) reads input pixel (2i+a+r-1, ...), i.e. block
        i + (a+r-1)//2, phase (a+r-1)%2;
      * a following stride-2 conv becomes a 2x2 *stride-1* conv over block
        space (:func:`_pack_s2d_conv1`), and a following 2x2/s2 maxpool
        becomes a max over the 4 phase groups — either way the result is
        back in natural (N, H/2, W/2, O) layout and the rest of the net is
        unchanged.

    Taps that fall outside the packed kernels' support carry exact zeros,
    so the math (incl. edge padding) is identical up to fp reduction order
    (bit-identical for the maxpool variant).  ~75% / ~44% of the packed
    MACs are those structural zeros — traded for full-width MXU tiles on
    what were the worst-utilized layers.  Measured: a win for the
    conv_conv stem, a loss for conv_pool (PERF.md round 2)."""
    k0h, k0w, c0, o0 = w0.shape
    pw0 = jnp.zeros((3, 3, 4 * c0, 4 * o0), w0.dtype)
    for a in range(2):
        for b in range(2):
            for r in range(3):
                for s in range(3):
                    di, dy = (a + r - 1) // 2 + 1, (a + r - 1) % 2
                    dj, dx = (b + s - 1) // 2 + 1, (b + s - 1) % 2
                    ci = (dy * 2 + dx) * c0
                    oi = (a * 2 + b) * o0
                    pw0 = pw0.at[di, dj, ci:ci + c0, oi:oi + o0].set(w0[r, s])
    return pw0, jnp.tile(b0, 4)


def _pack_s2d_conv1(w1: jnp.ndarray):
    """3x3/s2 conv -> 2x2 stride-1 block-space conv consuming phase channels."""
    k1h, k1w, c1, o1 = w1.shape
    pw1 = jnp.zeros((2, 2, 4 * c1, o1), w1.dtype)
    for r in range(3):
        for s in range(3):
            di, a = (r - 1) // 2 + 1, (r - 1) % 2
            dj, b = (s - 1) // 2 + 1, (s - 1) % 2
            ci = (a * 2 + b) * c1
            pw1 = pw1.at[di, dj, ci:ci + c1, :].set(w1[r, s])
    return pw1


def _space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2, 4 * c)


def build_forward(
    spec: ModelSpec,
    compute_dtype: Any = jnp.float32,
    precision: str | lax.Precision = "highest",
    quant: str | None = None,
    stop_at: int | None = None,
    stem_s2d: bool = False,
    collect_conv_in_stats: "Callable[[int, jnp.ndarray], Any] | None" = None,
    collect_conv_out_stats: "Callable[[int, jnp.ndarray], Any] | None" = None,
) -> Callable[[dict, jnp.ndarray], tuple[jnp.ndarray, ...]]:
    """Compile a ModelSpec into ``apply(params, x) -> per-head raw outputs``.

    ``x`` is (N, S, S, 3) float32 in [0, 1]; each output is the raw
    (N, G, G, A*(5+C)) feature map of one [yolo] head, fp32.

    ``precision`` controls the conv multiply precision.  The backends'
    DEFAULT is *reduced* precision (bf16-class multiplies on both the TPU MXU
    and XLA:CPU — measured ~1e-1 abs error on unit-scale convs), which breaks
    the mandated bit-faithful parity (BASELINE.json:5).  We therefore default
    to HIGHEST (true fp32) and expose the fast path explicitly:
    ``compute_dtype=jnp.bfloat16`` + ``precision="default"`` is the MXU
    speed mode for benchmarks where reduced precision is acceptable.

    ``quant="w8a8"`` runs every conv whose params carry int8 weights on the
    int8 MXU path (ops/quant.py — 2x bf16 MAC rate on v5e); params must come
    from :func:`..ops.quant.quantize_params`.  Layers without a ``"wq"``
    entry (``skip_layers``) fall back to the fp path above.

    ``stop_at=k`` builds a *truncated* forward running layers 0..k and
    returning ``(output_of_layer_k,)`` — the stage profiler's primitive
    (utils/profiling.profile_stages): timing cumulative prefixes isolates
    per-stage cost without in-graph instrumentation, which the tunneled
    runtime's profiler cannot provide (PERF.md roadmap #4).

    ``collect_conv_in_stats=f`` makes the forward also return a per-conv
    stats dict ``{layer_idx: f(layer_idx, conv_input)}`` — the int8
    calibration hook (ops/quant.collect_act_scales supplies absmax or
    percentile statistics; bias_correct_params/rank_quant_noise compute
    their per-conv reductions in-program through it).  A hook may return
    ``None`` for convs it doesn't care about — nothing is collected for
    them, so the program output stays small (returning full conv inputs
    for a deep model at native size exceeds HBM — the p7@1536 compile
    OOM, perf/harvest_p7diag_r4.jsonl).  Mutually exclusive with
    ``stop_at`` (a truncated run would silently drop the collected
    stats).

    ``collect_conv_out_stats=f`` is the symmetric hook on each conv's
    *post-epilogue output* — the LSUV variance equalizer's primitive
    (weights.equalize_raw_params normalizes each conv's output std so
    synthetic heads don't saturate, VERDICT r4 weak #2).  One stats hook
    at a time (in XOR out)."""
    if quant not in (None, "w8a8", "w8"):
        raise ValueError(f"unsupported quant mode {quant!r}")
    if collect_conv_in_stats is not None and collect_conv_out_stats is not None:
        raise ValueError("one stats hook at a time: collect_conv_in_stats "
                         "and collect_conv_out_stats share the stats return")
    if (collect_conv_in_stats is not None
            or collect_conv_out_stats is not None) and stop_at is not None:
        raise ValueError("collect_conv_in_stats and stop_at are mutually "
                         "exclusive: the truncated return path would drop "
                         "the collected statistics")
    if stem_s2d:
        # Composable with quant as long as the stem convs themselves are
        # unquantized (the default early-layer skip guarantees it —
        # ops/quant.resolve_skip_layers); _packed_conv0 checks at trace time.
        if not stem_s2d_applicable(spec):
            raise ValueError("model's first two layers are not a "
                             "transformable stem pattern "
                             "(see stem_s2d_applicable / _stem_pattern)")
    pattern = _stem_pattern(spec) if stem_s2d else None
    needed = _needed_outputs(spec)
    layers = spec.layers
    dtype = jnp.dtype(compute_dtype)
    if isinstance(precision, str):
        precision = {
            "highest": lax.Precision.HIGHEST,
            "high": lax.Precision.HIGH,
            "default": lax.Precision.DEFAULT,
        }[precision]
    if dtype == jnp.bfloat16:
        # bf16 inputs already quantize the multiplies; HIGHEST would force a
        # slow multi-pass algorithm for no accuracy gain.
        precision = lax.Precision.DEFAULT

    acc_dtype = jnp.promote_types(jnp.float32, dtype)

    def _epilogue(y: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        y = y + b.astype(acc_dtype)
        y = jnp.where(y > 0, y, 0.1 * y)  # stem pattern guarantees leaky
        return y.astype(dtype) if dtype != jnp.dtype(acc_dtype) else y

    def apply(params: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
        cache: dict[int, jnp.ndarray] = {}
        heads: list[jnp.ndarray] = []
        stats: dict[int, jnp.ndarray] = {}
        # int8-resident chain map (static-int8 only; trace-time analysis of
        # which convs may hand int8 straight to the next conv).  Env
        # kill-switch mirrors PYTORCH_YOLO_NO_PALLAS for on-hardware A/B.
        chains: dict[int, int] = {}
        split_groups: dict[int, tuple[int, ...]] = {}
        if quant is not None:
            if os.environ.get("PYTORCH_YOLO_NO_INT8_RESIDENT") != "1":
                from ..ops.quant import int8_resident_chains

                chains = int8_resident_chains(spec, params)
            # split-concat convs carry per-branch scales ("sag") — the
            # concat channel boundaries come from the spec at trace time
            from ..ops.quant import concat_split_groups

            split_groups = concat_split_groups(spec)
        start = 0
        def _packed_conv0(xx):
            # Packed at trace time from the canonical params (tiny slice
            # writes — XLA folds them; the pytree layout is untouched so
            # checkpoints/quant/sharding never see the transform).
            if "w" not in params[0] or (pattern == "conv_conv"
                                        and "w" not in params[1]):
                raise ValueError(
                    "stem_s2d requires fp stem kernels, but the stem convs "
                    "are int8-quantized — keep layers 0/1 in the quant skip "
                    "set (default PYTORCH_YOLO_INT8_EARLY_STRIDE=8 does)")
            pw0, pb0 = _pack_s2d_conv0(params[0]["w"], params[0]["b"])
            y = _space_to_depth(xx).astype(dtype)
            y = lax.conv_general_dilated(
                y, pw0.astype(dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=_CONV_DIMS,
                preferred_element_type=acc_dtype, precision=precision)
            return _epilogue(y, pb0)

        if stem_s2d and stop_at == 0:
            # Truncated-at-the-stem profile of the graph that actually runs:
            # packed conv0 output (S2D layout, (N, H/2, W/2, 4*O0)) — NOT the
            # natural conv0, which the s2d forward never executes.
            return (_packed_conv0(x),)
        if stem_s2d and (stop_at is None or stop_at >= 1):
            y = _packed_conv0(x)
            if pattern == "conv_conv":
                pw1 = _pack_s2d_conv1(params[1]["w"])
                y = lax.conv_general_dilated(
                    y, pw1.astype(dtype), (1, 1), ((1, 0), (1, 0)),
                    dimension_numbers=_CONV_DIMS,
                    preferred_element_type=acc_dtype, precision=precision)
                x = _epilogue(y, params[1]["b"])
            else:  # conv_pool: 2x2/s2 maxpool == max over the 4 phase groups
                # static channel slices, not reshape(..., 4, O).max(3): the
                # 5-D reshape splits the minor (lane) dim and costs a
                # materialized relayout on TPU
                o = y.shape[-1] // 4
                x = jnp.maximum(
                    jnp.maximum(y[..., :o], y[..., o:2 * o]),
                    jnp.maximum(y[..., 2 * o:3 * o], y[..., 3 * o:]))
            if 1 in needed:
                cache[1] = x
            start = 2
        for layer in layers[start: len(layers) if stop_at is None else stop_at + 1]:
            if isinstance(layer, ConvSpec):
                p = params[layer.index]
                if collect_conv_in_stats is not None:  # int8 calibration pass
                    _s = collect_conv_in_stats(layer.index, x)
                    if _s is not None:
                        stats[layer.index] = _s
                if quant == "w8" and "wq" in p:
                    # Weight-only int8 (W8): kernels stream from HBM as
                    # int8 and dequantize per call (wq·ws — XLA fuses the
                    # cast+scale into the conv's operand read); activations
                    # stay in the compute dtype, so accuracy is bf16-class
                    # (weight rounding only) at 4x less weight traffic
                    # than fp32 / 2x less than bf16.
                    w = (p["wq"].astype(jnp.float32)
                         * p["ws"]).astype(dtype)
                    x = _conv(x, w, p["b"], layer, dtype, precision)
                elif quant is not None and "wq" in p:
                    from ..ops.quant import quantized_conv

                    out_idx = chains.get(layer.index)
                    x = quantized_conv(
                        x, p["wq"], p["ws"], p["b"], layer, sx=p.get("sa"),
                        out_scale=(params[out_idx]["sa"]
                                   if out_idx is not None else None),
                        sxg=p.get("sag"),
                        splits=(split_groups.get(layer.index)
                                if "sag" in p else None))
                else:
                    x = _conv(x, p["w"], p["b"], layer, dtype, precision)
                if collect_conv_out_stats is not None:
                    _s = collect_conv_out_stats(layer.index, x)
                    if _s is not None:
                        stats[layer.index] = _s
            elif isinstance(layer, MaxPoolSpec):
                x = _maxpool(x, layer)
            elif isinstance(layer, UpsampleSpec):
                x = _upsample(x, layer.stride)
            elif isinstance(layer, ReorgSpec):
                x = _reorg(x, layer.stride)
            elif isinstance(layer, RouteSpec):
                srcs = [cache[j] for j in layer.layers]
                if layer.groups > 1:
                    # CSP split route (YOLOv4-tiny): each source contributes
                    # its group_id-th of `groups` equal channel slices.
                    srcs = [t[..., (t.shape[-1] // layer.groups) * layer.group_id:
                              (t.shape[-1] // layer.groups) * (layer.group_id + 1)]
                            for t in srcs]
                x = srcs[0] if len(srcs) == 1 else jnp.concatenate(srcs, axis=-1)
            elif isinstance(layer, ShortcutSpec):
                x = cache[layer.index - 1] + cache[layer.from_layer]
            elif isinstance(layer, (YoloSpec, RegionSpec)):
                heads.append(x.astype(acc_dtype))
                # x passes through unchanged (reference caches the raw map too)
            if layer.index in needed:
                cache[layer.index] = x
        if stop_at is not None:
            return (x,)  # truncated run: the cut layer's output
        if collect_conv_in_stats is not None or collect_conv_out_stats is not None:
            return tuple(heads), stats
        return tuple(heads)

    return apply


def head_shapes(spec: ModelSpec, input_size: "int | tuple[int, int]",
                batch: int = 1) -> tuple[tuple[int, ...], ...]:
    """Static (N, Gy, Gx, A*(5+C)) shape of each head at a given input size
    (square int or (H, W) pair)."""
    from ..config import head_strides

    sh, sw = (input_size, input_size) if isinstance(input_size, int) else input_size
    shapes = []
    for head, stride in zip(spec.yolo_layers, head_strides(spec)):
        shapes.append((batch, sh // stride, sw // stride,
                       len(head.anchors) * (5 + head.classes)))
    return tuple(shapes)
