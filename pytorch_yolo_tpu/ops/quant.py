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
from jax import lax

from ..config import ConvSpec, ModelSpec, RegionSpec, YoloSpec

_QEPS = 1e-12  # guards all-zero tensors (sx would otherwise be 0)


def head_conv_indices(spec: ModelSpec) -> frozenset[int]:
    """Conv layers whose output feeds a detection head directly (the conv
    immediately preceding each ``[yolo]``/``[region]`` block)."""
    head_idx = {l.index for l in spec.layers
                if isinstance(l, (YoloSpec, RegionSpec))}
    return frozenset(l.index for l in spec.layers
                     if isinstance(l, ConvSpec) and (l.index + 1) in head_idx)


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
        ws = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0 + _QEPS  # (O,)
        wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
        q = {"wq": wq, "ws": ws, "b": jnp.asarray(p["b"], jnp.float32)}
        if act_scales is not None:
            q["sa"] = jnp.asarray(float(act_scales[layer.index]) + _QEPS,
                                  jnp.float32)
        out[layer.index] = q
    return out


def collect_act_scales(spec: ModelSpec, params: dict, x,
                       margin: float = 1.0) -> "dict[int, float]":
    """Calibrate static activation scales: run the fp32 forward on a batch
    of letterboxed calibration inputs and record each conv's input
    ``max|x| / 127``.

    ``params`` must be the *fp32* (un-quantized) pytree; ``x`` is
    (N, H, W, 3) f32 in [0, 1].  ``margin`` multiplies the observed range
    (>1 leaves headroom for activations outside the calibration set; values
    beyond the range saturate to ±127, which symmetric int8 handles
    gracefully)."""
    import jax
    import numpy as np

    from ..models.darknet import build_forward

    # jit: one compiled program (persistent-cache-friendly) instead of ~75
    # eager per-op dispatches at Detector construction.
    fwd = jax.jit(build_forward(spec, collect_conv_in_absmax=True))
    _, stats = fwd(params, jnp.asarray(x, jnp.float32))
    return {idx: float(np.asarray(v)) * margin / 127.0
            for idx, v in stats.items()}


def quantized_conv(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                   b: jnp.ndarray, spec: ConvSpec,
                   sx: jnp.ndarray | None = None) -> jnp.ndarray:
    """One W8A8 conv: per-tensor activation quant (dynamic ``max|x|`` when
    ``sx`` is None, static calibrated scale otherwise), int32 MXU
    accumulation, per-channel rescale + bias + (leaky) activation, fp32 out."""
    x = x.astype(jnp.float32)
    if sx is None:
        sx = jnp.max(jnp.abs(x)) / 127.0 + _QEPS
    xq = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    p = spec.padding
    acc = lax.conv_general_dilated(
        xq, wq,
        window_strides=(spec.stride, spec.stride),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * ws) + b
    if spec.activation == "leaky":
        y = jnp.where(y > 0, y, 0.1 * y)
    return y
