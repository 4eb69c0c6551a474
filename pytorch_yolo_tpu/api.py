"""Public detection API: load cfg/weights -> detect -> boxes+scores+classes.

Keeps the reference's API surface (SURVEY.md §1 L5, BASELINE.json:5):
``load(cfg, weights) -> model`` and ``detect(image, conf, nms) -> boxes,
scores, classes`` — while the implementation is a single jitted XLA program
per (source shape, input size): on-device letterbox -> conv stack -> fused
decode -> fixed-shape NMS -> un-letterbox.  The only host<->device traffic is
the uint8 image in and the fixed (K, 7) result out (vs. the reference's
float H2D + mid-NMS ``unique`` sync + dynamic D2H, SURVEY.md §3.2).

Pipelines are cached per (batch, H0, W0, size, thresholds): video streams and
fixed-size datasets compile once; multi-resolution {320, 416, 608} keeps one
warm cache entry each (shape-bucketed XLA caches, BASELINE.json:10).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import ModelSpec, build_spec, parse_cfg_text
from .models.darknet import build_forward
from .ops.decode import decode_all
from .ops.nms import NMSResult, batched_nms, batched_nms_fused
from .ops.pallas_kernels import decode_score_all
from .ops.postprocess import unletterbox_boxes, unletterbox_boxes_dynamic
from .ops.preprocess import letterbox_batch, letterbox_geometry, letterbox_host
from .parallel.sharding import (
    batch_sharding,
    make_batch_mesh,
    pad_to_multiple,
    replicate_params,
)
from .utils.names import load_classes
from .weights import Params, load_weights, random_raw_params, fold_batchnorm

log = logging.getLogger(__name__)


class Detection(NamedTuple):
    """Per-image detection result in original-image pixel coordinates.

    Row format follows the reference (SURVEY.md §1 L4):
    boxes (M, 4) x1,y1,x2,y2 float32; obj (M,); cls_score (M,); cls_id (M,) int32.
    """

    boxes: np.ndarray
    obj: np.ndarray
    cls_score: np.ndarray
    cls_id: np.ndarray

    def __len__(self) -> int:
        return int(self.boxes.shape[0])


def _transfer_dtype(transfer: str) -> str:
    """Host-path H2D mode: "f32" normalized floats, "u8" rounded bytes."""
    try:
        return {"f32": "float32", "u8": "uint8"}[transfer]
    except KeyError:
        raise ValueError(f"transfer must be 'f32' or 'u8', got {transfer!r}") from None


def _normalize_channels(images: np.ndarray) -> np.ndarray:
    """Coerce the trailing channel axis to 3 (grayscale/BGRA inputs)."""
    if images.shape[-1] == 1:  # grayscale -> replicate channels
        return np.repeat(images, 3, axis=-1)
    if images.shape[-1] == 4:  # BGRA/RGBA -> drop alpha
        return np.ascontiguousarray(images[..., :3])
    if images.shape[-1] != 3:
        raise ValueError(f"expected 1/3/4 channels, got {images.shape[-1]}")
    return images


@dataclasses.dataclass(frozen=True)
class _PipelineKey:
    batch: int
    orig_h: int  # 0 for prepared-input pipelines (host letterbox)
    orig_w: int
    size: int
    conf: float
    iou: float
    max_det: int
    bgr: bool
    prepared: bool = False


class Detector:
    """Loaded YOLO model bound to a device (or device mesh) for inference."""

    def __init__(
        self,
        spec: ModelSpec,
        params: Params,
        class_names: Sequence[str] | None = None,
        compute_dtype=jnp.float32,
        mesh=None,
        score_mode: str = "obj",
        precision: str = "highest",
        cfg_text: str | None = None,
        use_pallas: bool | None = None,
        interp: str = "linear",
        quant: str | None = None,
        quant_skip_layers: "object" = "heads",
        keep_fp32_params: bool = True,
        stem_s2d: bool | None = None,
        quant_calib: "Sequence[np.ndarray] | None" = None,
        quant_calib_bgr: bool = True,
        quant_calib_margin: float = 1.0,
        quant_calib_percentile: "float | None" = None,
        quant_calib_size: "int | tuple[int, int] | None" = None,
        quant_skip_noisy: int = 0,
        quant_split_concat: bool = False,
        quant_smooth: "float | None" = None,
        quant_bias_correct: bool = False,
        quant_recipe: "str | None" = None,
        quant_act_scales: "dict[int, float] | None" = None,
        quant_bias_delta: "dict[int, object] | None" = None,
    ) -> None:
        self.spec = spec
        self.cfg_text = cfg_text
        self.class_names = tuple(class_names) if class_names else load_classes()
        self.score_mode = score_mode
        if use_pallas is None and os.environ.get("PYTORCH_YOLO_NO_PALLAS") == "1":
            # ops kill-switch: force the jnp decode/NMS path without touching
            # code (e.g. if a Mosaic toolchain change wedges remote compiles)
            use_pallas = False
        self.use_pallas = use_pallas
        self.interp = interp
        if quant is None and any("wq" in p for p in params.values()):
            quant = "w8a8"  # params arrived pre-quantized
        if quant is None and quant_calib is not None:
            raise ValueError("quant_calib given but quant is None — pass "
                             "quant='w8a8' to use static int8 calibration")
        if quant is None and quant_act_scales is not None:
            raise ValueError("quant_act_scales given but quant is None — "
                             "pass quant='w8a8' to serve persisted scales")
        if quant not in (None, "w8a8", "w8"):
            raise ValueError(f"unknown quant mode {quant!r} "
                             "(None, 'w8a8', or 'w8')")
        if quant == "w8" and (
                quant_calib is not None or quant_act_scales is not None
                or quant_bias_delta is not None or quant_skip_noisy
                or quant_split_concat or quant_smooth is not None
                or quant_bias_correct or quant_recipe is not None
                or quant_calib_percentile is not None):
            raise ValueError(
                "quant='w8' is weight-only int8 — activations stay in the "
                "compute dtype, so there is nothing to calibrate; drop the "
                "quant_calib/scales/knob arguments (they are w8a8 concepts)")
        if quant_recipe not in (None, "auto", "none"):
            raise ValueError(
                f"unknown quant_recipe {quant_recipe!r} ('auto' or 'none')")
        _explicit_knobs = (quant_smooth is not None or quant_bias_correct
                           or quant_split_concat or quant_skip_noisy
                           or quant_calib_percentile is not None)
        if quant_recipe is None and quant_calib is not None \
                and not _explicit_knobs:
            # Calibration DEFAULT (round 4): plain quant_calib gets the
            # recipe unless the caller picked knobs themselves or opted
            # out with quant_recipe="none".  Flipped after the recommended
            # config's TPU drift bound landed: yolov3 0.9425 vs 0.9058
            # plain-served, csp see perf/harvest_r4.jsonl — the CPU
            # ladder's lift reproduces on hardware, and the recipe is
            # speed-pinned free (perf/large_r3.jsonl steps 19-22).
            quant_recipe = "auto"
        if quant_recipe == "auto":
            # "auto" = the measured best zero-cost calibration recipe
            # (PERF.md round-3 sessions 5-7, CPU drift ladder on synthetic
            # weights — re-tuned in ONE place when real weights land):
            # p99.9 percentile ranging + per-channel smoothing + DFQ bias
            # correction.  The three are complementary — each single knob
            # is model-dependent (percentile and bc both LOSE on the tiny
            # family in isolation) but the trio measured best on BOTH
            # families (yolov3 0.894→0.9622, tiny 0.886→0.943): clipping
            # introduces a systematic shift that bc removes, and the
            # smoothed grids handle the channel spread clipping can't.
            if quant_calib is None:
                raise ValueError(
                    "quant_recipe='auto' requires quant_calib images (the "
                    "recipe is a calibration policy)")
            if _explicit_knobs:
                raise ValueError(
                    "quant_recipe='auto' chooses the int8 knobs itself — "
                    "drop the explicit quant_smooth/quant_bias_correct/"
                    "quant_split_concat/quant_skip_noisy/"
                    "quant_calib_percentile arguments (or pass "
                    "quant_recipe='none' to drive the knobs yourself)")
            quant_calib_percentile = 99.9
            quant_smooth = 0.5
            quant_bias_correct = True
        if quant_skip_noisy and quant_calib is None:
            raise ValueError(
                "quant_skip_noisy requires quant_calib images (noise "
                "attribution runs the fp calibration forward); with "
                "persisted scales the skip set persists alongside them "
                "(quant_state())")
        if quant_split_concat and quant_calib is None:
            raise ValueError(
                "quant_split_concat requires quant_calib images (per-branch "
                "scales come from the calibration forward); persisted scale "
                "files carry the per-branch lists and reload them "
                "automatically")
        if quant_smooth is not None and quant_calib is None:
            raise ValueError(
                "quant_smooth requires quant_calib images (per-channel "
                "smoothing balances calibrated activation maxima against "
                "weight ranges); persisted scale files carry the "
                "per-channel grids and reload them automatically")
        if quant_smooth is not None and quant_split_concat:
            raise ValueError(
                "quant_smooth and quant_split_concat are mutually exclusive "
                "— per-channel smoothing subsumes per-branch split scales")
        if quant_bias_correct and quant_calib is None:
            raise ValueError(
                "quant_bias_correct requires quant_calib images (the "
                "correction averages each conv's quantization error on the "
                "calibration forward); persisted scale files carry the "
                "bias deltas and reload them automatically")
        if quant_bias_delta is not None and quant_calib is not None:
            raise ValueError(
                "pass either quant_calib (fresh calibration) or "
                "quant_bias_delta (persisted deltas), not both")
        self._quant_skip: frozenset[int] = frozenset()
        self._bias_deltas: "dict[int, np.ndarray]" = {}
        self._quant_calib_size: "tuple[int, int] | None" = None
        # Normalized for quant_state() stamping: "none" (explicit opt-out)
        # persists like the pre-recipe default — no "recipe" field.
        self._quant_recipe = None if quant_recipe == "none" else quant_recipe
        if quant is not None:
            # int8 MXU serving mode (ops/quant.py): folded fp32 kernels are
            # quantized here, once, at construction (no-op per layer if
            # already int8).  quant_skip_layers="heads" (default) keeps the
            # detection-head output convs in fp — the int8 mAP-killer.
            # resolve_skip_layers additionally skips the large-spatial early
            # convs (input stride < 8) — but ONLY where the b64 A/Bs
            # measured it a win: models WITHOUT an early maxpool ladder,
            # served with reduced-precision glue (yolov3 int8+bf16 glue
            # 1602 vs 1420 quantize-all, perf/int8_serving_ab_r3.jsonl;
            # yolov4 1231 vs 998 and csp 1378 vs 1229 with the skip,
            # perf/large_r3.jsonl steps 12-13).  fp32 glue pays 4x
            # activation bytes on the skipped stages (1241 — a loss), and
            # early-pool families keep their int8-resident ladders (tiny:
            # 4566 quantize-all vs 3350/4288 skipped).  Env
            # PYTORCH_YOLO_INT8_EARLY_STRIDE forces either way.
            from .ops.quant import (collect_act_scales,
                                    default_early_min_stride,
                                    quantize_params, resolve_skip_layers)

            # w8 has no activation quantization, so the early-stride skip
            # (an activation-requant-cost mitigation) is irrelevant —
            # quantize every non-head conv's weights.  The threshold itself
            # is the measured per-topology policy (stride 8 for most
            # early-skip-profitable families, 16 for the stride-64-deep
            # p6 ladder, 32 for the stride-128-deep p7 ladder —
            # ops/quant.default_early_min_stride).
            early_default = default_early_min_stride(spec) if (
                quant == "w8a8"
                and jnp.dtype(compute_dtype) in (jnp.bfloat16, jnp.float16)
            ) else 0
            quant_skip_layers = resolve_skip_layers(
                spec, quant_skip_layers, default_min_stride=early_default)
            self._quant_skip = quant_skip_layers

            act_scales = None
            if quant_act_scales is not None:
                # Pre-computed static scales (e.g. persisted by a previous
                # calibration via act_scales()): skip the calibration
                # forward entirely — calibrate once, serve many times.
                if quant_calib is not None:
                    raise ValueError("pass either quant_calib (images) or "
                                     "quant_act_scales (persisted scales), "
                                     "not both")
                def _revive(v):
                    if isinstance(v, dict):  # {"per_channel": [...]} — the
                        # persisted smoothed grid (quant_state())
                        return np.asarray(v["per_channel"], np.float32)
                    if isinstance(v, (list, tuple)):  # per-branch (split)
                        return [float(s) for s in v]
                    return float(v)

                act_scales = {int(k): _revive(v)
                              for k, v in quant_act_scales.items()}
            elif quant_calib is not None:
                # Static activation scales: run the fp32 forward once on the
                # letterboxed calibration images; the compiled int8 program
                # then skips every per-conv dynamic max|x| reduction (the
                # serialization that made dynamic int8 slower than bf16 on
                # TPU — PERF.md round 2).
                if any("wq" in p for p in params.values()):
                    raise ValueError(
                        "quant_calib requires fp32 params (calibration runs "
                        "the fp forward); these arrived pre-quantized")
                from .ops.preprocess import letterbox_host

                # quant_calib_bgr must match how the detector will be served
                # (detect(bgr=...)): calibrating on channel-swapped images
                # mismatches the scales to the served activation statistics.
                # Default True matches cv2.imread-style BGR inputs (every
                # CLI path, incl. evaluate); pass False when serving RGB
                # frames with detect(bgr=False).
                # Calibration size MUST match the served size (round-5
                # hardware finding, perf/harvest_r5.jsonl step 6): p6
                # calibrated at its native 1280 but served at 640 dropped
                # static-int8 set agreement to 0.11 where dynamic scales
                # held 0.66 — activation maxima scale with spatial extent,
                # so mismatched scales clip catastrophically.  Default
                # stays the cfg [net] size (the reference's serving
                # default); pass the serving resolution (CLI --reso does)
                # whenever it differs.
                if quant_calib_size is None:
                    s = (spec.net.height, spec.net.width)
                else:
                    qs = quant_calib_size
                    s = (qs, qs) if isinstance(qs, int) else (qs[0], qs[1])
                    from .config import head_strides

                    mod = max(32, max(head_strides(spec)))
                    for d in s:
                        if d % mod:
                            raise ValueError(
                                f"quant_calib_size {quant_calib_size} must "
                                f"be a multiple of {mod} (deepest head "
                                "stride of this model)")
                self._quant_calib_size = s
                canvases = np.stack([
                    letterbox_host(_normalize_channels(im), s,
                                   bgr=quant_calib_bgr, method=interp)[0]
                    for im in quant_calib])
                concat_groups = None
                if quant_split_concat:
                    # Per-branch scales for route-concat convs — the
                    # measured worst int8 noise source (the bimodal concat
                    # magnitudes, perf/int8_attrib_cpu_r3.jsonl); same MXU
                    # FLOPs (ops/quant.quantized_conv split path).
                    from .ops.quant import concat_split_groups

                    concat_groups = {
                        i: g for i, g in concat_split_groups(spec).items()
                        if i not in quant_skip_layers}
                act_scales = collect_act_scales(
                    spec, params, canvases, margin=quant_calib_margin,
                    percentile=quant_calib_percentile,
                    concat_groups=concat_groups,
                    smooth_alpha=quant_smooth)
                if quant_skip_noisy:
                    # Calibration-time noise attribution: quantize once
                    # under the base policy, rank each quantized conv's
                    # isolated int8 error on the first calibration canvas,
                    # and keep the K noisiest in fp.  Measured recovery
                    # (perf/int8_attrib_cpu_r3.jsonl, yolov3 @416): top-8
                    # lifts post-NMS set agreement 0.894 -> 0.936 for
                    # ~9 pts of skipped-FLOP share.
                    from .ops.quant import rank_quant_noise

                    qtmp = quantize_params(spec, params,
                                           skip_layers=quant_skip_layers,
                                           act_scales=act_scales)
                    ranked = rank_quant_noise(spec, params, qtmp,
                                              canvases[:1])
                    quant_skip_layers = quant_skip_layers | frozenset(
                        i for i, _ in ranked[:quant_skip_noisy])
                    self._quant_skip = quant_skip_layers
            fp_params = params
            params = quantize_params(spec, params,
                                     skip_layers=quant_skip_layers,
                                     act_scales=act_scales)
            if quant_bias_correct:
                # DFQ-style correction: absorb each quantized conv's mean
                # pre-activation error (fp vs int8 on the same calibration
                # input) into its bias — zero runtime cost, persisted as
                # quant_state()["bias_delta"].
                from .ops.quant import bias_correct_params

                params, self._bias_deltas = bias_correct_params(
                    spec, fp_params, params, canvases[:1])
            elif quant_bias_delta:
                from .ops.quant import apply_bias_deltas

                self._bias_deltas = {
                    int(k): np.asarray(v, np.float32)
                    for k, v in quant_bias_delta.items()}
                params = apply_bias_deltas(params, self._bias_deltas)
            if quant_act_scales is not None:
                # Scales persisted under one skip policy and loaded under
                # another leave the uncovered convs silently dynamic (and
                # the resident-chain fast path off for them) — say so.
                missing = sorted(k for k, p in params.items()
                                 if "wq" in p and "sa" not in p
                                 and "sag" not in p)
                if missing:
                    import warnings

                    warnings.warn(
                        f"quant_act_scales covers {len(quant_act_scales)} "
                        f"layers but {len(missing)} quantized convs have no "
                        f"scale (e.g. {missing[:4]}) — they fall back to "
                        "dynamic quantization; re-calibrate under the "
                        "current skip policy for full static int8",
                        stacklevel=2)
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.precision = precision
        self.quant = quant
        if stem_s2d is None:
            # Default: ON for reduced-precision serving modes (measured +6%
            # on-chip bf16, PERF.md round 2), OFF for the fp32 parity mode
            # (it permutes conv reduction order, which would perturb
            # bit-faithful comparisons).  Env overrides both ways (ops
            # kill-switch symmetry with PYTORCH_YOLO_NO_PALLAS).
            from .models.darknet import _stem_pattern

            env = os.environ.get("PYTORCH_YOLO_STEM_S2D")
            pattern = _stem_pattern(spec)
            if quant is not None and not {0, 1} <= self._quant_skip:
                # s2d packs the stem's fp kernels; a quantized stem (early
                # skip disabled) has none to pack.  With the default early
                # skip the stem convs stay fp, so s2d composes with int8
                # (measured A/B: tools/int8_serving_ab_r3.py).
                pattern = None
            if env == "0":
                stem_s2d = False
            elif env == "1":
                stem_s2d = pattern is not None
            elif quant is not None:
                # int8 is a throughput mode by definition; the fp stem
                # (early-skipped) gets the same s2d win as bf16 serving.
                stem_s2d = pattern == "conv_conv"
            else:
                # Data-driven default: only the conv_conv (Darknet-53) stem
                # measured faster on TPU (+6% bf16); conv_pool (tiny/v2) was
                # measured a net LOSS (-12%/-7%, PERF.md r2 sessions 8-9 —
                # the 4x structural-zero FLOPs outweigh the tiny stem's MXU
                # win), so it stays opt-in via env=1 / stem_s2d=True.
                # Allowlist of dtypes, not "anything non-f32": f64 is the
                # exactness-pinning dtype and must keep reference order.
                stem_s2d = (pattern == "conv_conv"
                            and jnp.dtype(compute_dtype) in (jnp.bfloat16,
                                                             jnp.float16))
        self.stem_s2d = stem_s2d
        self._forward = build_forward(spec, compute_dtype=compute_dtype,
                                      precision=precision, quant=quant,
                                      stem_s2d=stem_s2d)
        self.mesh = mesh
        self.weights_source: str | None = None  # set by load(); None=synthetic

        cdtype = jnp.dtype(compute_dtype)
        # Checkpoints are fp32-canonical: when kernels are about to be
        # pre-cast to a reduced compute dtype, keep an fp32 host copy so
        # save_checkpoint never silently persists bf16 weights.
        self._fp32_params = None
        # The fp32 host copy costs host RAM (yolov3: ~248 MB); serving fleets
        # that never checkpoint can pass keep_fp32_params=False, in which
        # case save_checkpoint on a reduced-precision detector raises.
        if keep_fp32_params and cdtype != jnp.float32 and quant is None:
            host = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
                    for k, v in params.items()}
            # Only a genuinely-fp32 source is canonical: upcasting params
            # that arrived already reduced (bf16) would launder lost
            # precision into a "canonical" checkpoint (save_checkpoint's
            # dtype guard rejects those instead).
            if all(a.dtype == np.float32 for p in host.values() for a in p.values()):
                self._fp32_params = host

        def place(path_key, a):
            # Pre-cast conv kernels to the compute dtype at load time: in bf16
            # mode this halves weight HBM traffic and removes the per-step
            # cast (biases stay fp32 — they are added post-accumulation).
            arr = jnp.asarray(a)
            if cdtype != jnp.float32 and path_key == "w":
                arr = arr.astype(cdtype)
            return arr

        host = {k: {kk: place(kk, vv) for kk, vv in v.items()} for k, v in params.items()}
        if mesh is not None:
            self.params = replicate_params(host, mesh)
        else:
            self.params = host
        import collections

        self._pipelines: "collections.OrderedDict[_PipelineKey, object]" = (
            collections.OrderedDict())
        self.max_cached_pipelines = 32  # LRU bound for long-running servers

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def load(
        cls,
        cfg: str,
        weights: str | None = None,
        names: str | None = None,
        mesh=None,
        compute_dtype=jnp.float32,
        precision: str = "highest",
        interp: str = "linear",
        quant: str | None = None,
        quant_skip_layers: "object" = "heads",
        use_pallas: bool | None = None,
        score_mode: str = "obj",
        stem_s2d: bool | None = None,
        quant_calib: "Sequence[np.ndarray] | None" = None,
        quant_calib_bgr: bool = True,
        quant_calib_margin: float = 1.0,
        quant_calib_percentile: "float | None" = None,
        quant_calib_size: "int | tuple[int, int] | None" = None,
        quant_skip_noisy: int = 0,
        quant_split_concat: bool = False,
        quant_smooth: "float | None" = None,
        quant_bias_correct: bool = False,
        quant_recipe: "str | None" = None,
        quant_act_scales: "dict[int, float] | None" = None,
        quant_bias_delta: "dict[int, object] | None" = None,
        synthetic: str = "he",
    ) -> "Detector":
        """Reference-compatible entry: paths to ``.cfg`` (+ ``.weights``).

        ``cfg`` may also be a zoo model name ("yolov3", "yolov3-tiny").
        With ``weights=None`` the model gets synthetic random weights
        (offline testing; SURVEY.md §4.2).  ``synthetic`` picks the
        regime: ``"he"`` (plain He init — fastest; deep models saturate
        their head sigmoids, fine for throughput/compile work) or
        ``"live"`` (He + LSUV variance equalization,
        ``weights.equalize_raw_params`` — a few extra stats forwards, and
        head logits land in the sigmoid's responsive range so accuracy
        metrics like drift measure live channels; VERDICT r4 weak #2).
        Ignored when real ``weights`` are given."""
        if cfg.endswith(".cfg"):
            with open(cfg, "r", encoding="utf-8") as f:
                cfg_text = f.read()
        else:
            from .models.zoo import _GENERATORS

            cfg_text = _GENERATORS[cfg]()
        spec = build_spec(parse_cfg_text(cfg_text))
        if weights is not None:
            params = load_weights(spec, weights)
        else:
            if synthetic not in ("he", "live"):
                raise ValueError(f"unknown synthetic regime {synthetic!r} "
                                 "(expected 'he' or 'live')")
            raw = random_raw_params(spec)
            if synthetic == "live":
                from .weights import equalize_raw_params

                raw = equalize_raw_params(spec, raw)
            params = fold_batchnorm(spec, raw)
        det = cls(spec, params, class_names=load_classes(names),
                  mesh=mesh, compute_dtype=compute_dtype, precision=precision,
                  cfg_text=cfg_text, interp=interp, quant=quant,
                  quant_skip_layers=quant_skip_layers, use_pallas=use_pallas,
                  score_mode=score_mode, stem_s2d=stem_s2d,
                  quant_calib=quant_calib, quant_calib_bgr=quant_calib_bgr,
                  quant_calib_margin=quant_calib_margin,
                  quant_calib_percentile=quant_calib_percentile,
                  quant_calib_size=quant_calib_size,
                  quant_skip_noisy=quant_skip_noisy,
                  quant_split_concat=quant_split_concat,
                  quant_smooth=quant_smooth,
                  quant_bias_correct=quant_bias_correct,
                  quant_recipe=quant_recipe,
                  quant_act_scales=quant_act_scales,
                  quant_bias_delta=quant_bias_delta)
        det.weights_source = weights  # None = synthetic random (provenance)
        return det

    def act_scales(self) -> "dict[int, float | list[float]]":
        """The static int8 activation scales baked into the params (one per
        statically-quantized conv; a *list* of per-branch scales for
        split-concat convs — quant_split_concat).  Persist as JSON and hand
        back to ``load(..., quant_act_scales=...)`` to serve without
        re-running the calibration forward (calibrate once, serve many)."""
        out: dict = {}
        for idx, p in self.params.items():
            if "sa" in p:
                sa = np.asarray(p["sa"])
                out[idx] = (float(sa) if sa.ndim == 0 else
                            {"per_channel": [float(s) for s in sa]})
            elif "sag" in p:
                out[idx] = [float(s) for s in np.asarray(p["sag"])]
        return out

    def quant_state(self) -> dict:
        """JSON-ready static-int8 serving state: the calibrated activation
        scales **plus the resolved skip set** (heads + early-stride +
        ``quant_skip_noisy`` picks), so a reload reproduces the exact
        quantized-conv partition of the calibration run.  Reload with::

            load(model, weights, quant="w8a8",
                 quant_act_scales=state["scales"],
                 quant_skip_layers=frozenset(state["skip"]))

        The CLI ``--int8-scales JSON`` writes/reads this format (and still
        accepts the older flat ``{idx: scale}`` files, which reload under
        the default skip policy)."""
        state = {"version": 1,
                 "scales": {int(i): s for i, s in self.act_scales().items()},
                 "skip": sorted(int(i) for i in self._quant_skip)}
        if self._quant_recipe is not None:
            # Lets the CLI accept `--int8-recipe auto --int8-scales f.json`
            # on a RESTART: a file stamped with the same recipe loads
            # instead of demanding a re-calibration.
            state["recipe"] = self._quant_recipe
        if self._quant_calib_size is not None:
            # Provenance: static scales are only valid at the calibrated
            # serving size (r5 finding — p6 calib@1280/served@640 dropped
            # agreement to 0.11); the CLI warns when a loaded file's
            # calib_size mismatches the served --reso.
            state["calib_size"] = list(self._quant_calib_size)
        if self._bias_deltas:
            # quant_bias_correct deltas: reload via quant_bias_delta= so the
            # corrected detector revives without the calibration images.
            state["bias_delta"] = {
                int(i): [float(v) for v in d]
                for i, d in self._bias_deltas.items()}
        return state

    def save_checkpoint(self, path: str) -> None:
        """Persist the converted (folded, HWIO) params + cfg so future loads
        skip .weights parsing entirely (SURVEY.md §5.4)."""
        from .utils.checkpoint import save_checkpoint

        if self.cfg_text is None:
            raise ValueError("detector has no cfg text to checkpoint")
        if any("wq" in p for p in self.params.values()):
            raise ValueError(
                "cannot checkpoint an int8-quantized detector; checkpoints are "
                "fp32 canonical — load without quant, checkpoint, then requantize")
        if self._fp32_params is not None:
            host_params = self._fp32_params
        else:
            host_params = jax.tree_util.tree_map(np.asarray, self.params)
            bad = sorted(k for k, p in host_params.items()
                         if any(np.asarray(a).dtype != np.float32 for a in p.values()))
            if bad:
                raise ValueError(
                    f"cannot checkpoint non-fp32 params (layers {bad[:4]}...); "
                    "checkpoints are fp32 canonical")
        save_checkpoint(path, self.cfg_text, host_params, self.class_names)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "Detector":
        from .utils.checkpoint import load_checkpoint

        spec, cfg_text, params, names = load_checkpoint(path)
        return cls(spec, params, class_names=names, cfg_text=cfg_text, **kw)

    # ------------------------------------------------------------------
    # Jitted pipeline construction (one XLA program per shape bucket)
    # ------------------------------------------------------------------

    def _build_pipeline(self, key: _PipelineKey):
        if key.batch == 1 and self.quant == "w8a8":
            # Measured own-goal guardrail (VERDICT r3 #6): EVERY zoo family
            # is slower quantized at batch 1 — the requant epilogues are
            # pure overhead when the batch can't fill the MXU (yolov3 b1:
            # 3.10 ms int8sb vs 1.58 bf16, perf/gaps_r3.jsonl).
            log.warning(
                "building a batch-1 pipeline on an int8 (w8a8) detector: "
                "batch-1 latency measured ~2x WORSE quantized on every zoo "
                "family (yolov3: 3.10 ms int8 vs 1.58 bf16 — "
                "perf/gaps_r3.jsonl); serve batch-1 with bf16 instead")
        forward = self._forward
        spec = self.spec
        score_mode = self.score_mode

        use_pallas = self.use_pallas
        interp = self.interp

        def postprocess(heads) -> NMSResult:
            rows = decode_score_all(heads, spec, key.size,
                                    score_mode=score_mode, use_pallas=use_pallas)
            return batched_nms_fused(
                rows,
                conf_thresh=key.conf,
                iou_thresh=key.iou,
                max_det=key.max_det,
                use_pallas=use_pallas,
            )

        if self.mesh is not None:
            # Pallas kernels are opaque to the GSPMD partitioner — run the
            # decode/NMS stage under shard_map so each chip executes the
            # kernels on its local batch shard (no cross-batch communication
            # exists in this stage by construction).
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            from .parallel.sharding import BATCH_AXIS

            n_heads = len(spec.yolo_layers)
            postprocess = shard_map(
                postprocess,
                mesh=self.mesh,
                in_specs=(tuple(P(BATCH_AXIS) for _ in range(n_heads)),),
                out_specs=NMSResult(*(P(BATCH_AXIS) for _ in range(5))),
                check_vma=False,
            )

        if key.prepared:
            # Host-letterboxed inputs with per-image traced geometry: ONE
            # compiled pipeline serves every source resolution (COCO-style
            # heterogeneous datasets; SURVEY.md §7 P6 shape-bucket note).
            def pipeline(params, x: jnp.ndarray, geos: jnp.ndarray) -> NMSResult:
                if x.dtype == jnp.uint8:  # uint8-transfer mode: /255 on-device
                    x = x.astype(jnp.float32) / np.float32(255.0)
                heads = forward(params, x)
                res = postprocess(tuple(heads))
                return res._replace(
                    boxes=unletterbox_boxes_dynamic(res.boxes, geos))
        else:
            geo = letterbox_geometry(key.orig_h, key.orig_w, key.size)

            def pipeline(params, imgs: jnp.ndarray) -> NMSResult:
                x = letterbox_batch(imgs, size=key.size, bgr=key.bgr, method=interp)
                heads = forward(params, x)
                res = postprocess(tuple(heads))
                return res._replace(boxes=unletterbox_boxes(res.boxes, geo))

        if self.mesh is not None:
            rep = jax.sharding.NamedSharding(self.mesh, jax.sharding.PartitionSpec())
            arg_shardings = [jax.tree_util.tree_map(lambda _: rep, self.params),
                             batch_sharding(self.mesh)]
            if key.prepared:
                arg_shardings.append(batch_sharding(self.mesh))
            return jax.jit(pipeline, in_shardings=tuple(arg_shardings))
        return jax.jit(pipeline)

    def _pipeline(self, key: _PipelineKey):
        fn = self._pipelines.get(key)
        if fn is None:
            fn = self._build_pipeline(key)
            self._pipelines[key] = fn
            while len(self._pipelines) > self.max_cached_pipelines:
                self._pipelines.popitem(last=False)  # evict least-recent
        else:
            self._pipelines.move_to_end(key)
        return fn

    def _resolve_size(self, size: "int | tuple[int, int] | None"):
        """Default to the cfg's [net] size, like the reference's detect().

        Accepts a square int or an (H, W) pair (rectangular net input)."""
        if size is None:
            h, w = self.spec.net.height, self.spec.net.width
            size = w if h == w else (h, w)
        dims = size if isinstance(size, tuple) else (size,)
        # The grid must stay integral through the deepest downsample so the
        # upsample+route fusions re-align: %(deepest head stride), i.e.
        # %64 for yolov4-p6, %128 for yolov4-p7, %32 otherwise.
        from .config import head_strides

        mod = max(32, max(head_strides(self.spec)))
        for d in dims:
            if d % mod:
                raise ValueError(
                    f"input size {size} must be a multiple of {mod} "
                    f"(deepest head stride of this model)")
        return size

    # ------------------------------------------------------------------
    # Detection entry points
    # ------------------------------------------------------------------

    def detect(
        self,
        image: np.ndarray,
        size: int | None = None,
        conf: float = 0.5,
        iou: float = 0.4,
        max_det: int = 300,
        bgr: bool = True,
    ) -> Detection:
        """Detect objects in one (H, W, 3) uint8 image."""
        return self.detect_batch(image[None], size, conf, iou, max_det, bgr)[0]

    def detect_batch(
        self,
        images: np.ndarray,
        size: int | None = None,
        conf: float = 0.5,
        iou: float = 0.4,
        max_det: int = 300,
        bgr: bool = True,
    ) -> list[Detection]:
        """Detect objects in a uniform (N, H, W, 3) uint8 batch.

        On a mesh, the batch is padded to a multiple of the mesh size and
        sharded over chips; results gather over ICI."""
        images = np.ascontiguousarray(images)
        if images.ndim != 4:
            raise ValueError(f"expected (N, H, W, C) uint8 batch, got {images.shape}")
        images = _normalize_channels(images)
        size = self._resolve_size(size)
        n = images.shape[0]
        run_n = n
        if self.mesh is not None:
            m = self.mesh.devices.size
            run_n = pad_to_multiple(n, m)
            if run_n != n:
                pad = np.zeros((run_n - n,) + images.shape[1:], dtype=images.dtype)
                images = np.concatenate([images, pad], axis=0)

        key = _PipelineKey(
            batch=run_n, orig_h=images.shape[1], orig_w=images.shape[2],
            size=size, conf=conf, iou=iou, max_det=max_det, bgr=bgr,
        )
        dev_imgs = (
            jax.device_put(images, batch_sharding(self.mesh))
            if self.mesh is not None else jnp.asarray(images)
        )
        res: NMSResult = self._pipeline(key)(self.params, dev_imgs)
        return self._trim(res, n)

    def raw_result(self, images: np.ndarray, size: int | None = None, conf: float = 0.5,
                   iou: float = 0.4, max_det: int = 300, bgr: bool = True) -> NMSResult:
        """Device-resident fixed-shape result (no host trim) — for pipelining.

        Single-device only: unlike :meth:`detect_batch` there is no mesh
        padding (the caller owns batch geometry for double-buffering), so a
        mesh-bound Detector whose batch doesn't divide the mesh raises."""
        if images.ndim != 4:
            raise ValueError(f"expected (N, H, W, C) uint8 batch, got {images.shape}")
        images = _normalize_channels(np.ascontiguousarray(images))
        if self.mesh is not None and images.shape[0] % self.mesh.devices.size:
            raise ValueError(
                f"raw_result batch {images.shape[0]} must divide the mesh size "
                f"{self.mesh.devices.size}; use detect_batch for auto-padding")
        size = self._resolve_size(size)
        key = _PipelineKey(
            batch=images.shape[0], orig_h=images.shape[1], orig_w=images.shape[2],
            size=size, conf=conf, iou=iou, max_det=max_det, bgr=bgr,
        )
        dev_imgs = (jax.device_put(images, batch_sharding(self.mesh))
                    if self.mesh is not None else jnp.asarray(images))
        return self._pipeline(key)(self.params, dev_imgs)

    @staticmethod
    def _trim(res: NMSResult, n: int) -> list[Detection]:
        """One D2H copy, then trim each image's valid rows on host."""
        boxes, obj, cls_score, cls_id, valid = jax.device_get(
            (res.boxes, res.obj, res.cls_score, res.cls_id, res.valid)
        )
        out = []
        for i in range(n):
            m = valid[i]
            out.append(Detection(
                boxes=boxes[i][m], obj=obj[i][m],
                cls_score=cls_score[i][m], cls_id=cls_id[i][m],
            ))
        return out

    def detect_prepared(
        self,
        x: np.ndarray,
        geos: np.ndarray,
        size: int,
        conf: float = 0.5,
        iou: float = 0.4,
        max_det: int = 300,
    ) -> NMSResult:
        """Run the shape-agnostic pipeline on host-letterboxed inputs.

        ``x``: (N, S, S, 3) from :func:`letterbox_host` — float32 in [0, 1],
        or uint8 0..255 (``out_dtype="uint8"``; normalized on-device, 4x
        less H2D traffic); ``geos``: (N, 5) float32 [scale, pad_x, pad_y,
        orig_w, orig_h].  One compiled program serves every source
        resolution (jit re-traces once per input dtype)."""
        key = _PipelineKey(batch=x.shape[0], orig_h=0, orig_w=0, size=size,
                           conf=conf, iou=iou, max_det=max_det, bgr=False,
                           prepared=True)
        if self.mesh is not None:
            # Place shards directly on their devices — committing the batch
            # to device 0 (plain jnp.asarray) and letting jit reshard would
            # double-transfer the hot serve/evaluate path.
            sh = batch_sharding(self.mesh)
            x, geos = jax.device_put(x, sh), jax.device_put(geos, sh)
        return self._pipeline(key)(self.params, jnp.asarray(x), jnp.asarray(geos))

    def _pad_to_mesh(self, x: np.ndarray,
                     geos: "np.ndarray | None" = None):
        """Pad a (usually batch-1) dispatch up to the mesh size with zero
        frames (+ identity geometries) so GSPMD divisibility holds; callers
        trim back with :meth:`_trim`.  No-op off-mesh."""
        m = self.mesh.devices.size if self.mesh is not None else 1
        if m <= 1 or x.shape[0] % m == 0:
            return (x, geos) if geos is not None else x
        pad = m - x.shape[0] % m
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        if geos is None:
            return x
        geos = np.concatenate(
            [geos, np.tile([[1.0, 0, 0, 1, 1]], (pad, 1)).astype(np.float32)])
        return x, geos

    def detect_many(
        self,
        images: Sequence[np.ndarray],
        size: "int | tuple[int, int] | None" = None,
        conf: float = 0.5,
        iou: float = 0.4,
        max_det: int = 300,
        bgr: bool = True,
        batch: int = 8,
        transfer: str = "f32",
    ) -> list[Detection]:
        """Detect over a list of differently-sized images with true batching.

        Mirrors the reference's batching strategy (letterbox each image on
        the host, then stack the uniform letterboxed tensors into batches —
        SURVEY.md §3.2/§2.1 #9) on the shape-agnostic prepared pipeline.
        Chunks are double-buffered: host letterboxing of chunk t+1 overlaps
        device compute of chunk t.  ``transfer="u8"`` ships rounded uint8
        letterboxed canvases (4x less H2D; <=0.5/255 per-pixel rounding)."""
        rsize = self._resolve_size(size)
        out_dtype = _transfer_dtype(transfer)
        out: list[Detection] = []
        pending: "tuple[NMSResult, int] | None" = None

        def prepare(chunk):
            lbs, geos = [], []
            for im in chunk:
                lb, g = letterbox_host(_normalize_channels(im), rsize, bgr=bgr,
                                       method=self.interp, out_dtype=out_dtype)
                lbs.append(lb)
                geos.append([g.scale, g.pad_x, g.pad_y, g.orig_w, g.orig_h])
            x = np.stack(lbs)
            ge = np.asarray(geos, dtype=np.float32)
            n = len(chunk)
            if n < batch:  # pad so every chunk reuses one compiled pipeline
                x = np.concatenate([x, np.zeros((batch - n,) + x.shape[1:], x.dtype)])
                ge = np.concatenate(
                    [ge, np.tile([[1.0, 0, 0, 1, 1]], (batch - n, 1)).astype(np.float32)])
            return x, ge, n

        for start in range(0, len(images), batch):
            x, ge, n = prepare(images[start : start + batch])
            res = self.detect_prepared(x, ge, rsize, conf=conf, iou=iou,
                                       max_det=max_det)
            if pending is not None:
                out.extend(self._trim(*pending))
            pending = (res, n)
        if pending is not None:
            out.extend(self._trim(*pending))
        return out

    def detect_stream(
        self,
        images,
        size: int | None = None,
        conf: float = 0.5,
        iou: float = 0.4,
        max_det: int = 300,
        bgr: bool = True,
        depth: int = 2,
        host_preproc: bool = False,
        transfer: str = "f32",
    ):
        """Pipelined detection over an iterable of (H, W, 3) uint8 images.

        Keeps ``depth`` device batches in flight so host-side work (decode,
        drawing, bookkeeping) of item t+1 overlaps device compute of item t —
        the same double-buffering the video loop uses (SURVEY.md §3.4's
        serial-loop fix), generalized to any image source.  Yields
        :class:`Detection` in input order.

        ``host_preproc=True`` letterboxes on the host and feeds the
        shape-agnostic pipeline — use for heterogeneous source sizes (e.g.
        COCO) to avoid per-shape recompilation."""
        import collections

        inflight: collections.deque = collections.deque()
        rsize = self._resolve_size(size)

        # Mesh-bound detectors need batches that divide the mesh:
        # _pad_to_mesh the batch-1 dispatch (results are trimmed to 1
        # below — wasteful for streams, but latency-bound streaming on a
        # multi-chip mesh is a consistency path, not a throughput one).

        def dispatch(img: np.ndarray):
            if host_preproc:
                lb, geo = letterbox_host(
                    _normalize_channels(img), rsize, bgr=bgr, method=self.interp,
                    out_dtype=_transfer_dtype(transfer))
                geos = np.asarray(
                    [[geo.scale, geo.pad_x, geo.pad_y, geo.orig_w, geo.orig_h]],
                    dtype=np.float32)
                x, geos = self._pad_to_mesh(lb[None], geos)
                inflight.append(self.detect_prepared(
                    x, geos, rsize, conf=conf, iou=iou, max_det=max_det))
            else:
                inflight.append(self.raw_result(
                    self._pad_to_mesh(img[None]), size=size, conf=conf,
                    iou=iou, max_det=max_det, bgr=bgr))

        it = iter(images)
        try:
            for _ in range(depth):
                dispatch(next(it))
        except StopIteration:
            pass
        for img in it:
            res = inflight.popleft()
            dispatch(img)
            yield self._trim(res, 1)[0]
        while inflight:
            yield self._trim(inflight.popleft(), 1)[0]

    # ------------------------------------------------------------------

    def warmup(self, shapes: Sequence[tuple[int, int]], sizes: Sequence[int] = (416,),
               batch: int = 1, **kw) -> None:
        """Pre-compile pipelines for the given (H0, W0) x size buckets."""
        for h, w in shapes:
            dummy = np.zeros((batch, h, w, 3), dtype=np.uint8)
            for s in sizes:
                self.detect_batch(dummy, size=s, **kw)


def load(cfg: str, weights: str | None = None, **kw) -> Detector:
    """Module-level convenience mirroring the reference's ``load`` API."""
    return Detector.load(cfg, weights, **kw)


def detect(model: Detector, image: np.ndarray, conf: float = 0.5, nms: float = 0.4,
           size: int | None = None, **kw) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference-shaped free function: returns (boxes, scores, classes).

    ``scores`` follows the reference row meaning: the objectness column
    (SURVEY.md §1 L4/L5)."""
    d = model.detect(image, size=size, conf=conf, iou=nms, **kw)
    return d.boxes, d.obj, d.cls_id
