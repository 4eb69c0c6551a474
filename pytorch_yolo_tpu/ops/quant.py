"""W8A8 dynamic-range quantization for the conv stack.

TPU-first rationale (PERF.md roadmap #7): the v5e MXU executes int8×int8→int32
at twice the bf16 MAC rate, and int8 weights quarter the per-batch weight
traffic from HBM (YOLOv3: 248 MB fp32 → 62 MB).  The reference has no
quantization path (it rides fp32 cuDNN; SURVEY.md §2.2) — this is a
beyond-reference serving feature.

Scheme (calibration-free):

* **Weights**: symmetric per-output-channel int8.  Scales are computed once
  at load from the BN-folded kernels: ``s_o = max|w[..., o]| / 127``.
* **Activations**: symmetric per-tensor **dynamic** int8 — the scale is
  ``max|x| / 127`` computed on the live tensor inside the compiled program.
  Dynamic ranging costs one reduction per conv but needs no calibration
  dataset, which this framework does not ship (real weights/data land in a
  later round; see PERF.md).  The reduction is HBM-bandwidth-free in
  practice: XLA fuses it into the preceding elementwise epilogue.
* **Accumulation** in int32 on the MXU, rescaled to fp32 as
  ``y = acc * (s_x · s_o) + b``; LeakyReLU and everything between convs
  (maxpool -inf pad, route, shortcut, upsample) stays in fp32, so only the
  MXU operands are quantized and the Darknet layer semantics are untouched.

First/last layer sensitivity: the detection-head output convs (the conv
feeding each ``[yolo]``/``[region]`` layer) are the classic int8 mAP-killer
— their outputs are raw box/score logits with no downstream layers to absorb
quantization noise.  ``skip_layers`` therefore defaults to ``"heads"``
(keep those convs fp); pass an explicit container (possibly empty) to
override.
"""

from __future__ import annotations

from typing import Container

import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import (ConvSpec, MaxPoolSpec, ModelSpec, RegionSpec,
                      RouteSpec, UpsampleSpec, YoloSpec)

_QEPS = 1e-12  # guards all-zero tensors (sx would otherwise be 0)


def head_conv_indices(spec: ModelSpec) -> frozenset[int]:
    """Conv layers whose output feeds a detection head directly (the conv
    immediately preceding each ``[yolo]``/``[region]`` block)."""
    head_idx = {l.index for l in spec.layers
                if isinstance(l, (YoloSpec, RegionSpec))}
    return frozenset(l.index for l in spec.layers
                     if isinstance(l, ConvSpec) and (l.index + 1) in head_idx)


def _layer_input_strides(spec: ModelSpec) -> "dict[int, int]":
    """Per-layer input stride (net-input pixels per feature cell at the
    layer's input) for EVERY layer.  Routes/shortcuts take their source's
    stride, so the map is exact for branched necks, not just linear
    backbones."""
    from ..config import ReorgSpec, RouteSpec, ShortcutSpec

    out_stride: dict[int, int] = {}
    in_stride: dict[int, int] = {}
    cur = 1
    for layer in spec.layers:
        idx = layer.index
        if isinstance(layer, RouteSpec):
            cur = out_stride[layer.layers[0]]
        elif isinstance(layer, ShortcutSpec):
            cur = out_stride[idx - 1]
        in_stride[idx] = cur
        if isinstance(layer, (ConvSpec, MaxPoolSpec, ReorgSpec)):
            cur *= layer.stride
        elif isinstance(layer, UpsampleSpec):
            cur //= layer.stride
        out_stride[idx] = cur
    return in_stride


def conv_input_strides(spec: ModelSpec) -> "dict[int, int]":
    """Per-conv input stride (see :func:`_layer_input_strides`)."""
    in_stride = _layer_input_strides(spec)
    return {l.index: in_stride[l.index] for l in spec.layers
            if isinstance(l, ConvSpec)}


def early_skip_profitable(spec: ModelSpec, min_stride: int = 8) -> bool:
    """Is the early-layer int8 skip a measured win for this topology?

    Profitable iff the model has NO maxpool in the early (input stride <
    ``min_stride``) region.  The hardware A/Bs split the zoo exactly along
    this line: conv-chain stems win with the skip regardless of activation
    — yolov3/leaky 1602 vs 1420 quantize-all
    (perf/int8_serving_ab_r3.jsonl), yolov4/mish 1231 vs 998 and
    yolov4-csp 1378 vs 1229 with the skip forced
    (perf/large_r3.jsonl steps 12-13, which flipped csp int8 from −7% to
    ~+3% vs bf16) — while early conv→maxpool→conv ladders LOSE it
    (tiny 4566 quantize-all vs 3350/4288 skipped; v2 2938 vs 2164/2619):
    their early pools ride the int8-resident chain (requant folded into
    the producer, pools int8-transparent), and the skip forfeits exactly
    that.  yolov4-tiny's pools sit at input strides 4/8/16 → ladder
    family, skip off.  SPP pools (stride 32) don't count — they are deep.
    """
    in_stride = _layer_input_strides(spec)
    return not any(isinstance(l, MaxPoolSpec) and l.index in in_stride
                   and in_stride[l.index] < min_stride
                   for l in spec.layers)


def default_early_min_stride(spec: ModelSpec) -> int:
    """The measured early-skip stride threshold for this topology (the
    VERDICT-r3 size-aware default, pinned on hardware A/Bs).

    0 = no early skip (conv->maxpool->conv ladder families keep their
    int8-resident chains: tiny 4566 quantize-all vs 3350/4288 skipped —
    :func:`early_skip_profitable`).  Everything else gets the stride-8
    skip that the b64 A/Bs made the serving default (yolov3 1602 vs 1420,
    csp 1378 vs 1229, perf/int8_serving_ab_r3 / large_r3) — EXCEPT the
    deepest ladder class.

    The discriminator for the deeper threshold is the model's deepest
    head stride, NOT the input size: at the same served size (640) and
    the same stride-8 threshold, yolov4x-mish WINS int8 (+3.3%, 566 vs
    548) and yolov4-p6 ties (+0.7%) while yolov4-p7 LOSES 9.5% (139 vs
    154) — perf/gaps_r3.jsonl.  p7's loss is its stride-8/16 stages'
    spatial requant tax (80²/40² maps: 10.8 ms int8 vs 5.9 bf16, 5.2 vs
    3.2 — perf/p7_postmortem_r3.jsonl), which its stride-32..128 tail
    cannot win back (those stages measure even under int8); the es
    ladder recovered 139.1 -> es16 148.7 -> es32 152.3 vs bf16 154.6
    (perf/p7_es_ab_r3.jsonl).  Only the stride-128-deep five-scale
    ladder has that much large-spatial depth, so only it gets the
    stride-32 threshold.

    Round 4 widened the rule one class: the p6@640 es ladder measured
    es16 above es8 in BOTH harvest sessions against same-session bf16
    controls (es8 183.4/185.7, es16 187.4/188.3, es32 between —
    perf/harvest_r4.jsonl steps 9-12), so the stride-64-deep four-scale
    ladder gets 16.  p5 (deepest stride 32) keeps 8 — its es8 win is
    banked (+3.8%, perf/large_r3.jsonl) and its r4 control held.
    Revisit all three classes when real weights land.
    """
    if not early_skip_profitable(spec):
        return 0
    from ..config import head_strides

    deepest = max(head_strides(spec))
    if deepest >= 128:
        return 32
    return 16 if deepest >= 64 else 8


def early_conv_indices(spec: ModelSpec, min_stride: int = 8) -> frozenset[int]:
    """Convs operating on large-spatial tensors (input stride < min_stride).

    These layers are HBM-bandwidth / VPU-bound, not MXU-bound: the b64
    stage profile (perf/int8_stage_profile_r3.jsonl) measured the int8
    conv0/208-sq stages *slower* than bf16 (requant overhead with no MXU
    gain — the first conv's K=27 can't even fill the 256-wide MXU), while
    stride>=8 stages sped up 1.3-2x under int8.  Skipping them is
    therefore faster AND lower-drift."""
    return frozenset(i for i, s in conv_input_strides(spec).items()
                     if s < min_stride)


def concat_split_groups(spec: ModelSpec) -> "dict[int, tuple[int, ...]]":
    """Convs whose input is a multi-source route concat → per-source
    channel widths (the concat boundaries).

    These are the measured worst int8 offenders (rank_quant_noise /
    perf/int8_attrib_cpu_r3.jsonl: yolov3 convs 87 and 99 — an
    upsampled-deep tensor concatenated with a skip-shallow tensor has
    bimodal magnitude statistics, so ONE per-tensor activation scale
    wastes int8 steps on whichever branch is smaller).  The split-concat
    quantized conv (``quantized_conv(sxg=, splits=)``) gives each branch
    its own calibrated scale and merges the int32 accumulators in the
    epilogue — same MXU FLOPs, no fp fallback."""
    out: dict[int, tuple[int, ...]] = {}
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec) or layer.index == 0:
            continue
        prev = spec.layers[layer.index - 1]
        if isinstance(prev, RouteSpec) and len(prev.layers) > 1:
            out[layer.index] = tuple(
                spec.out_channels[j] // prev.groups for j in prev.layers)
    return out


def resolve_skip_layers(spec: ModelSpec,
                        skip_layers: "Container[int] | str" = "heads",
                        early_min_stride: "int | None" = None,
                        default_min_stride: int = 0) -> frozenset[int]:
    """Resolve the ``skip_layers`` token/container into explicit indices and
    union the early-layer skip.

    ``early_min_stride=None`` reads ``PYTORCH_YOLO_INT8_EARLY_STRIDE``,
    falling back to ``default_min_stride`` when the env var is unset.  The
    caller picks the default from the measured A/B
    (perf/int8_serving_ab_r3.jsonl, b64 same-session): the early skip pays
    off ONLY for conv_conv stems served with reduced-precision glue
    (yolov3 int8+bf16 1602 vs 1420 quantize-all) — with fp32 glue the 4x
    activation bytes lose (1241), and conv_pool families (tiny/v2) keep
    their early conv->maxpool->conv resident ladders (4566 vs 3350/4288).
    ``0`` disables the early skip entirely."""
    import os

    if early_min_stride is None:
        early_min_stride = int(
            os.environ.get("PYTORCH_YOLO_INT8_EARLY_STRIDE",
                           str(default_min_stride)))
    base = (head_conv_indices(spec) if skip_layers == "heads"
            else frozenset(skip_layers))
    if early_min_stride > 1:
        base = base | early_conv_indices(spec, early_min_stride)
    return base


def quantize_params(spec: ModelSpec, params: dict,
                    skip_layers: "Container[int] | str" = "heads",
                    act_scales: "dict[int, float] | None" = None) -> dict:
    """BN-folded fp32 params -> per-layer int8 weights + scales.

    Input pytree: ``{idx: {"w": HWIO f32, "b": (O,) f32}}`` (the framework's
    canonical folded layout).  Output adds, for quantized layers,
    ``{"wq": HWIO int8, "ws": (O,) f32}`` and drops ``"w"``; layers in
    ``skip_layers`` keep their fp32 kernel untouched.  The default
    ``"heads"`` skips the detection-head output convs (see module doc).

    ``act_scales`` (from :func:`collect_act_scales`) bakes a **static**
    per-layer activation scale ``"sa"`` into the pytree: the compiled
    program then skips the per-conv dynamic ``max|x|`` reduction — the
    serialization point that made dynamic int8 slower than bf16 on TPU
    (measured, PERF.md round 2)."""
    if skip_layers == "heads":
        skip_layers = head_conv_indices(spec)
    out = {}
    for layer in spec.layers:
        if not isinstance(layer, ConvSpec):
            continue
        p = params[layer.index]
        if layer.index in skip_layers or "wq" in p:  # skip or already int8
            out[layer.index] = dict(p)
            continue
        w = jnp.asarray(p["w"], jnp.float32)
        sv = act_scales.get(layer.index) if act_scales is not None else None
        if isinstance(sv, np.ndarray) and sv.ndim == 1:
            # Per-channel smoothed grid (collect_act_scales(smooth_alpha=)):
            # fold the grid vector into the kernels along C_in — the MXU
            # dequant then needs only ws (quantized_conv vector-sa path).
            if sv.shape[0] != w.shape[2]:
                raise ValueError(
                    f"conv {layer.index}: per-channel scale vector has "
                    f"{sv.shape[0]} entries for {w.shape[2]} input channels")
            v = jnp.asarray(np.maximum(sv, _QEPS), jnp.float32)
            w = w * v[None, None, :, None]
        ws = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + _QEPS  # (O,)
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        q = {"wq": wq, "ws": ws, "b": jnp.asarray(p["b"], jnp.float32)}
        if isinstance(sv, np.ndarray) and sv.ndim == 1:
            q["sa"] = v
            out[layer.index] = q
            continue
        # A conv without a calibrated scale (e.g. scales persisted under a
        # different skip policy) stays dynamic rather than erroring — the
        # caller warns about the coverage gap (api.Detector).
        if act_scales is not None and layer.index in act_scales:
            # max (not +): keeps a zero/degenerate scale positive while
            # making save->load->save round trips idempotent — an additive
            # epsilon would drift the persisted scale every cycle.
            sv = act_scales[layer.index]
            if isinstance(sv, (list, tuple)):
                # per-branch scales for a route-concat input
                # (collect_act_scales(concat_groups=)) — the split-concat
                # quantized conv consumes these as "sag"
                q["sag"] = jnp.asarray([max(float(s), _QEPS) for s in sv],
                                       jnp.float32)
            else:
                q["sa"] = jnp.asarray(max(float(sv), _QEPS), jnp.float32)
        out[layer.index] = q
    return out


_PCT_OCTAVES = 20.0  # dynamic range probed below each conv's max |x|
_PCT_ITERS = 16      # bisection steps: resolution 2^(OCT/2^ITERS) ≈ 0.02%


def _collect_percentile_stats(spec: ModelSpec, params: dict, x,
                              percentile: float, per_channel: bool):
    """Percentile activation statistics via bisection over pure reductions.

    Implementation history matters here — two op classes crash the remote
    TPU compiler (tpu_compile_helper exit 1) on p7-class calibration
    programs (~300 convs at native 1536², one jitted program):

    * ``jnp.percentile`` — a ~1.5·10⁸-element **sort** per conv
      (``perf/harvest_p7diag_r4.jsonl`` legs 2/4 crash, percentile-free
      legs 1/3 compile; ``perf/harvest_p7fix_r4.jsonl`` step 1 crashes
      with bias-correct already fixed);
    * log2-histogram **scatter-adds** of the same magnitude
      (``perf/harvest_p7iso_r4.jsonl`` step 2: the whole-tensor histogram
      alone, no bias-correct, crashes — while step 1's max-reduction
      stats program compiles in 110 s).

    What provably compiles at this scale is plain reductions, so the
    estimator uses only those:

      * pass 1 — per-conv global max |x| (plus per-channel maxima when
        smoothing / split-concat statistics are requested);
      * pass 2 — per conv, ``_PCT_ITERS`` bisection steps on the log2
        threshold exponent over ``[max·2^-OCTAVES, max]``; each step is
        one ``sum(|x| > thr)`` reduction inside a ``lax.fori_loop``.
        Only the resolved percentile values leave the program, so
        outputs stay KB-sized at any resolution.

    The estimate is conservative (never below the exact order statistic)
    and within a multiplicative 2^(OCTAVES/2^ITERS) ≈ 1.0002 of it at
    EVERY magnitude — far finer than the int8 step (1/127 ≈ 0.8%) and
    robust to range-stretching outliers (the property the percentile
    knob exists for).  Values ≤ max·2^-20 (incl. exact zeros) saturate
    at the bottom of the probed range, which only matters if >q% of a
    conv's inputs are that small — where the exact percentile would be
    ~0 too.  Runtime is ITERS extra passes over each conv input —
    calibration is offline and the passes are bandwidth-bound seconds.
    """
    import jax

    from ..models.darknet import build_forward

    m1 = lambda t: jnp.max(jnp.abs(t))
    mcs = lambda t: jnp.max(jnp.abs(t), axis=tuple(range(0, t.ndim - 1)))
    mstat = ((lambda i, t: (m1(t), mcs(t))) if per_channel
             else (lambda i, t: m1(t)))
    _, maxima = jax.jit(build_forward(spec, collect_conv_in_stats=mstat))(
        params, x)
    mw = {i: max(float(np.asarray(v[0] if per_channel else v)), _QEPS)
          for i, v in maxima.items()}
    mcv = ({i: np.maximum(np.asarray(v[1], np.float32), _QEPS)
            for i, v in maxima.items()} if per_channel else None)

    frac = percentile / 100.0

    def _bisect(a, m, axes, n):
        # Smallest probed threshold m·2^e with count(a > thr) ≤ n − k,
        # k = ceil(n·frac): the threshold covers ≥ k values, i.e. sits at
        # or above the k-th order statistic, within 2^(OCT/2^ITERS) of it.
        # m is scalar or (C,); counts reduce over `axes` to match.
        allowed = n - int(np.ceil(n * frac))
        shape = jnp.shape(m)

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            c = jnp.sum(a > m * jnp.exp2(mid), axis=axes)
            take_hi = c > allowed  # mid fails: answer is above mid
            return (jnp.where(take_hi, mid, lo),
                    jnp.where(take_hi, hi, mid))

        lo0 = jnp.full(shape, -_PCT_OCTAVES, jnp.float32)
        hi0 = jnp.zeros(shape, jnp.float32)
        _, hi = lax.fori_loop(0, _PCT_ITERS, body, (lo0, hi0))
        return m * jnp.exp2(hi)

    def pstat(i, t):
        a = jnp.abs(t).astype(jnp.float32)
        val = _bisect(a, jnp.float32(mw[i]), None, a.size)
        if not per_channel:
            return val
        c = int(t.shape[-1])
        valc = _bisect(a, jnp.asarray(mcv[i]),
                       tuple(range(a.ndim - 1)), a.size // c)
        return val, valc

    _, stats = jax.jit(build_forward(spec, collect_conv_in_stats=pstat))(
        params, x)
    return stats


def collect_act_scales(spec: ModelSpec, params: dict, x,
                       margin: float = 1.0,
                       percentile: "float | None" = None,
                       concat_groups: "dict[int, tuple[int, ...]] | None" = None,
                       smooth_alpha: "float | None" = None,
                       ):
    """Calibrate static activation scales: run the fp32 forward on a batch
    of letterboxed calibration inputs and record each conv's input range.

    ``params`` must be the *fp32* (un-quantized) pytree; ``x`` is
    (N, H, W, 3) f32 in [0, 1].

    ``percentile=None`` (default) uses the conservative max-calibration:
    per-image ``max|x|`` maxima, max-reduced over the calibration images
    (numerically the whole-batch max; per-image statistics are collected so
    robustness diagnostics can inspect spread).  ``percentile=q`` (e.g.
    99.9) instead takes the q-th percentile of ``|x|`` over all calibration
    values — a single outlier activation no longer stretches the scale, so
    the 127 int8 steps cover the bulk of the distribution (the clipped tail
    saturates to ±127, which symmetric int8 handles gracefully).
    Percentiles are computed by the compile-light reduction-bisection
    estimator (:func:`_collect_percentile_stats` — conservative to within
    ≈0.02%; exact ``jnp.percentile`` sorts AND histogram scatter-adds both
    crashed the TPU compiler on p7-class programs).

    ``margin`` multiplies the observed range (>1 leaves headroom for
    activations outside the calibration set).

    ``concat_groups`` (from :func:`concat_split_groups`) switches the
    listed convs to **per-branch** scales: the returned value for those
    indices is a list of per-group scales (group g = channel slice of the
    route concat) instead of one float — consumed by
    :func:`quantize_params` as ``"sag"``.  Group scales always come from
    per-channel statistics max-reduced over the group (exact for max
    calibration; for percentile calibration each channel's percentile is
    taken first, so the group scale is the max of per-channel percentiles
    — slightly conservative vs a whole-group percentile).

    ``smooth_alpha`` (SmoothQuant-style difficulty transfer, typically
    0.5) switches EVERY conv to a **per-input-channel quantization grid**:
    the returned value is a (C_in,) vector ``v_c = s_c · sx`` where
    ``s_c = a_c^α / w_c^(1-α)`` balances activation outliers against
    weight range per channel (``a_c`` = calibrated per-channel activation
    max, ``w_c`` = per-input-channel weight max) and
    ``sx = max_c(a_c/s_c)·margin/127`` is the smoothed tensor's scale.
    :func:`quantize_params` folds ``v_c`` into the kernels
    (``w·v_c`` along C_in) so the MXU dequant needs only ``ws`` — runtime
    cost is a vector (instead of scalar) multiply in the quantizer:
    zero extra FLOPs on every conv, unlike the concat-only split path.
    Mutually exclusive with ``concat_groups`` (per-channel subsumes
    per-group)."""
    import jax

    from ..models.darknet import build_forward

    if smooth_alpha is not None and concat_groups:
        raise ValueError("smooth_alpha and concat_groups are mutually "
                         "exclusive (per-channel smoothing subsumes "
                         "per-group split scales)")
    if smooth_alpha is not None and not 0.0 <= smooth_alpha <= 1.0:
        raise ValueError(f"smooth_alpha must be in [0, 1], got {smooth_alpha}")

    per_channel = bool(concat_groups) or smooth_alpha is not None
    x = jnp.asarray(x, jnp.float32)
    if percentile is None:
        stat1 = lambda t: jnp.max(jnp.abs(t), axis=tuple(range(1, t.ndim)))
        statc = lambda t: jnp.max(jnp.abs(t),
                                  axis=tuple(range(0, t.ndim - 1)))
        stat = ((lambda i, t: (stat1(t), statc(t))) if per_channel
                else (lambda i, t: stat1(t)))
        # jit: one compiled program (persistent-cache-friendly) instead of
        # ~75 eager per-op dispatches at Detector construction.
        fwd = jax.jit(build_forward(spec, collect_conv_in_stats=stat))
        _, stats = fwd(params, x)
    else:
        if not 0.0 < percentile <= 100.0:
            raise ValueError(f"percentile must be in (0, 100], got {percentile}")
        stats = _collect_percentile_stats(spec, params, x, percentile,
                                          per_channel)
    scales: dict = {}
    for idx, v in stats.items():
        whole = v[0] if per_channel else v
        if smooth_alpha is not None:
            a_c = np.maximum(np.asarray(v[1], np.float32), _QEPS)
            w = np.asarray(params[idx].get("w"), np.float32)
            w_c = np.maximum(np.abs(w).max(axis=(0, 1, 3)), _QEPS)
            s_c = a_c ** smooth_alpha / w_c ** (1.0 - smooth_alpha)
            s_c = np.maximum(s_c, _QEPS)
            sx = float((a_c / s_c).max()) * margin / 127.0 + _QEPS
            scales[idx] = (s_c * sx).astype(np.float32)
        elif concat_groups and idx in concat_groups:
            per_ch = np.asarray(v[1], np.float32)
            splits = concat_groups[idx]
            if int(per_ch.shape[-1]) != sum(splits):
                raise ValueError(
                    f"conv {idx}: concat split {splits} does not cover its "
                    f"{per_ch.shape[-1]} input channels")
            gs, off = [], 0
            for c in splits:
                gs.append(float(per_ch[off:off + c].max())
                          * margin / 127.0 + _QEPS)
                off += c
            scales[idx] = gs
        else:
            scales[idx] = float(np.max(np.asarray(whole))) * margin / 127.0 \
                + _QEPS
    return scales


def int8_resident_chains(spec: ModelSpec, params: dict) -> "dict[int, int]":
    """Map producer conv index -> consumer conv index for int8-resident links.

    A quantized conv ``j`` may emit int8 directly at its consumer's
    calibrated input scale (see :func:`quantized_conv` ``out_scale``) when:

    * ``j``'s params are quantized (``"wq"``), and
    * the layers between ``j`` and the next conv ``k`` are int8-transparent
      — maxpool (max commutes with the monotone round/clip quantizer) and
      nearest-neighbor upsample (pure value replication) — and
    * ``k`` is quantized with a *static* activation scale (``"sa"``), and
    * neither ``j``'s output nor any intermediate output is cached for a
      route/shortcut (those consumers expect fp32 activations).

    This keeps the Darknet-53 1x1->3x3 halves and the tiny/v2
    conv->maxpool->conv ladders entirely in int8 between MXU ops: the fp32
    activation tensor that the round-2 static-int8 path materialized per
    layer (4 bytes/value of pure HBM glue — the measured Amdahl residue,
    PERF.md round 3) becomes a 1-byte int8 write."""
    from ..models.darknet import _needed_outputs

    needed = _needed_outputs(spec)
    layers = spec.layers
    transparent = (MaxPoolSpec, UpsampleSpec)
    chains: dict[int, int] = {}
    for layer in layers:
        if not isinstance(layer, ConvSpec):
            continue
        p = params.get(layer.index)
        if p is None or "wq" not in p:
            continue
        if layer.index in needed:
            continue
        k = layer.index + 1
        ok = True
        while ok and k < len(layers) and isinstance(layers[k], transparent):
            if layers[k].index in needed:
                ok = False
            k += 1
        if not (ok and k < len(layers) and isinstance(layers[k], ConvSpec)):
            continue
        pk = params.get(layers[k].index)
        if pk is not None and "wq" in pk and "sa" in pk:
            chains[layer.index] = layers[k].index
    return chains


def quantized_conv(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                   b: jnp.ndarray, spec: ConvSpec,
                   sx: jnp.ndarray | None = None,
                   out_scale: jnp.ndarray | None = None,
                   sxg: jnp.ndarray | None = None,
                   splits: "tuple[int, ...] | None" = None) -> jnp.ndarray:
    """One W8A8 conv: per-tensor activation quant (dynamic ``max|x|`` when
    ``sx`` is None, static calibrated scale otherwise), int32 MXU
    accumulation, per-channel rescale + bias + (leaky) activation, fp32 out.

    **int8-resident variants** (the static-calibration Amdahl fix,
    PERF.md round 3): when ``x`` arrives already int8 it is consumed
    directly at scale ``sx`` (the producer quantized it — no round-trip
    through fp32 in HBM); when ``out_scale`` is given, the epilogue folds
    rescale + bias + leaky + the *next* conv's requantization into one
    fused register-resident expression and writes int8, quartering the
    activation HBM traffic between directly-chained convs.  LeakyReLU is
    positively homogeneous (``leaky(y/s) == leaky(y)/s`` for ``s > 0``),
    so requantizing before the activation is exact up to fp reassociation.

    **Split-concat variant** (``sxg`` + ``splits``, from
    :func:`concat_split_groups`): the input is a route concat whose
    branches have bimodal magnitudes — the measured worst int8 noise
    source (perf/int8_attrib_cpu_r3.jsonl).  Each channel group g is
    quantized at its own calibrated scale ``sxg[g]``, convolved over the
    matching kernel slice on the int8 MXU, and the partial accumulators
    merge in fp32: ``y = (Σ_g acc_g·sxg[g])·ws + b`` — a conv split along
    the reduction dim costs the same MACs, so accuracy is recovered at
    zero FLOP cost (vs skipping the conv entirely at fp rate)."""
    p = spec.padding

    def _mxu(xq, w):
        return lax.conv_general_dilated(
            xq, w,
            window_strides=(spec.stride, spec.stride),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    if sxg is not None and splits is not None and x.dtype != jnp.int8:
        if sum(splits) != x.shape[-1]:
            raise ValueError(f"concat splits {splits} do not cover the "
                             f"{x.shape[-1]} input channels")
        x = x.astype(jnp.float32)
        acc, off = None, 0
        for g, c in enumerate(splits):
            s = sxg[g]
            xqg = jnp.clip(jnp.round(x[..., off:off + c] / s),
                           -127, 127).astype(jnp.int8)
            part = _mxu(xqg, wq[:, :, off:off + c, :]).astype(jnp.float32) * s
            acc = part if acc is None else acc + part
            off += c
        sx = jnp.float32(1.0)  # per-group scales already folded into acc
    else:
        if x.dtype == jnp.int8:
            if sx is None:
                raise ValueError("int8-resident input requires a static scale")
            xq = x
        else:
            x = x.astype(jnp.float32)
            if sx is None:
                sx = jnp.max(jnp.abs(x)) / 127.0 + _QEPS
            xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
        acc = _mxu(xq, wq)
    from ..models.darknet import apply_activation

    # Dequant factor: with a per-channel smoothed grid (sx is a (C_in,)
    # vector — collect_act_scales(smooth_alpha=)) the grid is already
    # folded into the kernels, so ws alone dequantizes; the scalar paths
    # keep sx·ws.  out_scale may itself be a (C_out,) vector (a consumer
    # with a per-channel grid) — everything below is elementwise over the
    # channel-minor NHWC layout, so scalars and vectors broadcast alike.
    deq = ws if getattr(sx, "ndim", 0) == 1 else sx * ws
    if out_scale is not None:
        # Emit int8 at the consumer's calibrated input scale.  leaky/relu
        # are positively homogeneous, so divide first and activate after —
        # everything between the two MXU ops is one fused register-resident
        # elementwise chain with no fp32 tensor materialized.  mish is NOT
        # scale-commuting: activate at the true fp scale, then requantize
        # (still a fused elementwise chain, one extra vector multiply).
        if spec.activation in ("leaky", "relu", "linear"):
            y = acc.astype(jnp.float32) * (deq / out_scale) + b / out_scale
            y = apply_activation(y, spec.activation)
        else:
            y = apply_activation(acc.astype(jnp.float32) * deq + b,
                                 spec.activation) / out_scale
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    y = acc.astype(jnp.float32) * deq + b
    return apply_activation(y, spec.activation)


def rank_quant_noise(spec: ModelSpec, fp_params: dict, qparams: dict,
                     x) -> "list[tuple[int, float]]":
    """Rank quantized convs by *isolated* int8 noise, worst first.

    For every conv with ``"wq"`` in ``qparams``, compare the quantized conv
    against the fp32/HIGHEST conv **on the same fp32 input** (taken from a
    clean fp forward on ``x``), so upstream quantization noise cancels and
    the relative-L2 error measures only that layer's contribution.  Returns
    ``[(conv_index, rel_l2), ...]`` sorted descending.

    Measured motivation (perf/int8_attrib_cpu_r3.jsonl, yolov3 @416): the
    noisiest convs are the post-route-concat 1x1s (mixed-scale concat
    inputs defeat per-tensor activation scales) and the head-trunk convs;
    skipping the top-8 recovered post-NMS set agreement vs fp32/HIGHEST
    from 0.894 to 0.936 at +9 pts skipped-FLOP share.  Exposed to serving
    via ``Detector(quant_skip_noisy=K)`` / CLI ``--int8-skip-noisy K``.

    ``x`` is one (or a few) letterboxed (N, H, W, 3) f32 canvases — noise
    ranking is stable on a single image.  The fp-vs-quantized twin convs
    run IN-PROGRAM through the calibration hook and reduce straight to two
    scalars per conv (sum-of-squares of the error and of the fp output), so
    the program's outputs stay tiny and XLA frees each twin's activations
    immediately — materializing every conv input as a program output
    exceeded HBM for deep models at native size (the p7@1536 compile OOM,
    perf/harvest_p7diag_r4.jsonl)."""
    import jax

    from ..models.darknet import _conv, build_forward

    groups = concat_split_groups(spec)
    conv_layers = {l.index: l for l in spec.layers
                   if isinstance(l, ConvSpec)
                   and "wq" in qparams.get(l.index, ())}

    def _run(fp_p, q_p, xx):
        def hook(idx, t):
            layer = conv_layers.get(idx)
            if layer is None:
                return None
            fp, q = fp_p[idx], q_p[idx]
            y_fp = _conv(t, jnp.asarray(fp["w"], jnp.float32),
                         jnp.asarray(fp["b"], jnp.float32), layer,
                         jnp.float32, lax.Precision.HIGHEST)
            y_q = quantized_conv(t, q["wq"], q["ws"], q["b"], layer,
                                 sx=q.get("sa"), sxg=q.get("sag"),
                                 splits=(groups.get(idx)
                                         if "sag" in q else None))
            d = (y_q - y_fp).astype(jnp.float32)
            return jnp.sum(d * d), jnp.sum(y_fp * y_fp)

        fwd = build_forward(spec, collect_conv_in_stats=hook)
        _, stats = fwd(fp_p, xx)
        return stats

    stats = jax.jit(_run)(fp_params, qparams, jnp.asarray(x, jnp.float32))
    ranked: list[tuple[int, float]] = []
    for idx, (err_sq, ref_sq) in stats.items():
        denom = float(np.sqrt(float(ref_sq))) or 1.0
        ranked.append((idx, float(np.sqrt(float(err_sq))) / denom))
    ranked.sort(key=lambda t: (-t[1], t[0]))
    return ranked


def bias_correct_params(spec: ModelSpec, fp_params: dict, qparams: dict,
                        x) -> "tuple[dict, dict[int, np.ndarray]]":
    """Per-output-channel quantization bias correction (DFQ-style).

    Symmetric int8 rounding leaves each conv with a small *systematic*
    output bias: ``E[x·w] − E[x·wq·deq] = E[x·(w − wq·deq)]`` is nonzero
    whenever the rounding residues correlate with the activation means
    (always, in practice).  Absorb it into the conv bias: for every
    quantized conv compare the fp32 conv against the quantized conv on the
    SAME fp32 calibration input (upstream noise cancelled — the
    :func:`rank_quant_noise` isolation trick), average the pre-activation
    error over batch and space, and add it to ``b``.  Zero runtime cost —
    the bias add already exists in the epilogue.

    Pre-activation is what the bias shifts, so both convs run with a
    ``linear`` activation override; the correction is exact for the conv
    itself and first-order for what follows the (monotone) activation.

    Returns ``(corrected_qparams, {conv_index: delta})`` — the deltas
    persist in the quant-state file (``bias_delta``) so a scales-file
    revive reproduces the corrected detector bit-identically without the
    calibration images.

    The fp/quantized twin convs run IN-PROGRAM through the calibration
    hook, reducing each pair straight to its (C_out,) mean-error vector:
    the program's outputs are a handful of KB and the twins' activations
    are freed as soon as each delta is reduced.  (The previous
    implementation returned every conv's full input tensor as a program
    output and ran the twins eagerly — for yolov4-p7 calibrating at its
    native 1536² that output set is tens of GB and the remote compile
    died; isolated in perf/harvest_p7diag_r4.jsonl.)
    """
    import dataclasses

    import jax

    from ..models.darknet import _conv, build_forward

    groups = concat_split_groups(spec)
    # Pre-activation is what the bias shifts: both twins run `linear`.
    lin_layers = {l.index: dataclasses.replace(l, activation="linear")
                  for l in spec.layers
                  if isinstance(l, ConvSpec)
                  and "wq" in qparams.get(l.index, ())}

    def _run(fp_p, q_p, xx):
        def hook(idx, t):
            lin = lin_layers.get(idx)
            if lin is None:
                return None
            fp, q = fp_p[idx], q_p[idx]
            y_fp = _conv(t, jnp.asarray(fp["w"], jnp.float32),
                         jnp.asarray(fp["b"], jnp.float32), lin,
                         jnp.float32, lax.Precision.HIGHEST)
            y_q = quantized_conv(t, q["wq"], q["ws"], q["b"], lin,
                                 sx=q.get("sa"), sxg=q.get("sag"),
                                 splits=(groups.get(idx)
                                         if "sag" in q else None))
            return jnp.mean(y_fp - y_q, axis=(0, 1, 2))

        fwd = build_forward(spec, collect_conv_in_stats=hook)
        _, stats = fwd(fp_p, xx)
        return stats

    stats = jax.jit(_run)(fp_params, qparams, jnp.asarray(x, jnp.float32))
    out = dict(qparams)
    deltas: dict[int, np.ndarray] = {}
    for idx, dv in stats.items():
        d = np.asarray(dv, np.float32)
        deltas[idx] = d
        q = qparams[idx]
        out[idx] = {**q, "b": q["b"] + jnp.asarray(d)}
    return out, deltas


def apply_bias_deltas(qparams: dict,
                      deltas: "dict[int, np.ndarray]") -> dict:
    """Re-apply persisted :func:`bias_correct_params` deltas to a freshly
    quantized pytree (the scales-file revive path — no calibration images
    needed)."""
    out = dict(qparams)
    for idx, d in deltas.items():
        q = out.get(idx)
        if q is None or "wq" not in q:
            continue
        d = np.asarray(d, np.float32)
        if d.shape != np.shape(q["b"]):
            raise ValueError(
                f"conv {idx}: persisted bias_delta has shape {d.shape} for "
                f"a ({np.shape(q['b'])}) bias — scales file does not match "
                "this model")
        out[idx] = {**q, "b": q["b"] + jnp.asarray(d)}
    return out
