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
                    skip_layers: "Container[int] | str" = "heads") -> dict:
    """BN-folded fp32 params -> per-layer int8 weights + scales.

    Input pytree: ``{idx: {"w": HWIO f32, "b": (O,) f32}}`` (the framework's
    canonical folded layout).  Output adds, for quantized layers,
    ``{"wq": HWIO int8, "ws": (O,) f32}`` and drops ``"w"``; layers in
    ``skip_layers`` keep their fp32 kernel untouched.  The default
    ``"heads"`` skips the detection-head output convs (see module doc)."""
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
        out[layer.index] = {"wq": wq, "ws": ws, "b": jnp.asarray(p["b"], jnp.float32)}
    return out


def quantized_conv(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray,
                   b: jnp.ndarray, spec: ConvSpec) -> jnp.ndarray:
    """One W8A8 conv: dynamic per-tensor activation quant, int32 MXU
    accumulation, per-channel rescale + bias + (leaky) activation, fp32 out."""
    x = x.astype(jnp.float32)
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
