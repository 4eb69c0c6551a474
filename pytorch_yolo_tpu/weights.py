"""Darknet ``.weights`` binary IO and the JAX params pytree.

Replaces the reference's ``Darknet.load_weights`` (SURVEY.md §2.1 #4, §3.1):
a flat float32 stream consumed in cfg order, conv layers only.  Format
(SURVEY.md §5.4, [B]-tier stable public format):

    header:  int32 major, int32 minor, int32 revision
             if major*10+minor >= 2:  uint64 seen   else:  int32 seen
    body:    per conv layer, in cfg order:
             if batch_normalize: bn_bias[o], bn_scale[o], bn_rmean[o], bn_rvar[o]
             else:               conv_bias[o]
             then conv_weight in (out, in, kh, kw) row-major order

Getting the (bias, scale, mean, var) -> kernels order wrong produces garbage
detections *silently* (SURVEY.md §3.1 invariant) — ``tests/test_weights.py``
round-trips synthetic files to pin it.

TPU-first design choices:
  * Params are stored **NHWC-native**: conv kernels as (kh, kw, in, out)
    ("HWIO"), the layout ``lax.conv_general_dilated`` consumes directly on
    TPU — transposed once here at load time, never per step.
  * BatchNorm is **folded into the conv** at load time (inference-only
    framework): w' = w * gamma/sqrt(var+eps), b' = beta - gamma*mean/sqrt(..),
    so the compiled forward is pure conv+bias+leaky with no BN ops at all.
  * The pytree is a dict {layer_index: {"w": ..., "b": ...}} of numpy arrays;
    ``jax.device_put`` happens in the API layer with the chosen sharding.
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np

from .config import ConvSpec, ModelSpec

BN_EPS = 1e-5  # Darknet batch_normalize epsilon (SURVEY.md §7 hard parts)

Params = dict[int, dict[str, np.ndarray]]
RawParams = dict[int, dict[str, np.ndarray]]


class WeightsError(ValueError):
    """Raised for truncated / oversized / malformed .weights content."""


def _conv_specs(spec: ModelSpec) -> list[ConvSpec]:
    return [l for l in spec.layers if isinstance(l, ConvSpec)]


def param_count(spec: ModelSpec) -> int:
    """Total float32 count of the body stream for this model."""
    n = 0
    for c in _conv_specs(spec):
        n += 4 * c.filters if c.batch_normalize else c.filters
        n += c.filters * c.in_channels * c.size * c.size
    return n


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------


def read_weights_file(spec: ModelSpec, path: str) -> RawParams:
    """Parse a Darknet .weights file into raw (un-folded) per-layer arrays.

    Returns {conv_layer_index: {"w": (kh,kw,in,out) f32,
                                "bn_beta"/"bn_gamma"/"bn_mean"/"bn_var" or "b"}}.
    """
    with open(path, "rb") as f:
        data = f.read()
    return read_weights_bytes(spec, data)


def read_weights_bytes(spec: ModelSpec, data: bytes) -> RawParams:
    if len(data) < 12:
        raise WeightsError("file shorter than header")
    major, minor, revision = (int(v) for v in np.frombuffer(data, dtype=np.int32, count=3))
    offset = 12
    if major * 10 + minor >= 2:
        offset += 8  # uint64 seen
    else:
        offset += 4  # int32 seen
    if len(data) < offset:
        raise WeightsError(f"file shorter than v{major}.{minor} header")
    if (len(data) - offset) % 4:
        raise WeightsError("weight stream length is not a multiple of 4 bytes")

    flat = np.frombuffer(data, dtype=np.float32, offset=offset)
    expected = param_count(spec)
    if flat.size != expected:
        raise WeightsError(
            f"weight stream has {flat.size} floats, model needs {expected} "
            f"(header v{major}.{minor}.{revision})"
        )

    params: RawParams = {}
    ptr = 0

    def take(n: int) -> np.ndarray:
        nonlocal ptr
        out = flat[ptr : ptr + n]
        ptr += n
        return out

    for c in _conv_specs(spec):
        entry: dict[str, np.ndarray] = {}
        if c.batch_normalize:
            entry["bn_beta"] = take(c.filters).copy()   # bn bias
            entry["bn_gamma"] = take(c.filters).copy()  # bn scale
            entry["bn_mean"] = take(c.filters).copy()
            entry["bn_var"] = take(c.filters).copy()
        else:
            entry["b"] = take(c.filters).copy()
        k = take(c.filters * c.in_channels * c.size * c.size)
        # Darknet stores (out, in, kh, kw) row-major ("OIHW"); transpose once
        # to TPU-native HWIO.
        entry["w"] = np.ascontiguousarray(
            k.reshape(c.filters, c.in_channels, c.size, c.size).transpose(2, 3, 1, 0)
        )
        params[c.index] = entry
    return params


def fold_batchnorm(spec: ModelSpec, raw: RawParams) -> Params:
    """Fold BN statistics into conv weight/bias for inference.

    y = gamma * (conv(x) - mean) / sqrt(var + eps) + beta
      = conv(x) * s + (beta - mean * s),   s = gamma / sqrt(var + eps)
    """
    params: Params = {}
    for c in _conv_specs(spec):
        entry = raw[c.index]
        w = entry["w"]
        if c.batch_normalize:
            s = entry["bn_gamma"] / np.sqrt(entry["bn_var"] + BN_EPS)
            params[c.index] = {
                "w": (w * s[None, None, None, :]).astype(np.float32),
                "b": (entry["bn_beta"] - entry["bn_mean"] * s).astype(np.float32),
            }
        else:
            params[c.index] = {"w": w.astype(np.float32), "b": entry["b"].astype(np.float32)}
    return params


def load_weights_native(spec: ModelSpec, path: str, n_threads: int = 0) -> Params | None:
    """Folded params via the C++ loader (mmap + fused fold/transpose).

    Returns None when the native library is unavailable (no compiler etc.);
    raises WeightsError for malformed files.  Output is bit-identical to
    ``fold_batchnorm(read_weights_file(...))`` up to fp32 rounding of the
    fold arithmetic (pinned by tests/test_native.py)."""
    import ctypes

    from .native import LayerDescStruct, load_library

    lib = load_library()
    if lib is None:
        return None

    convs = _conv_specs(spec)
    params: Params = {}
    descs = (LayerDescStruct * len(convs))()
    offset = 0
    for i, c in enumerate(convs):
        w = np.empty((c.size, c.size, c.in_channels, c.filters), dtype=np.float32)
        b = np.empty((c.filters,), dtype=np.float32)
        params[c.index] = {"w": w, "b": b}
        descs[i].filters = c.filters
        descs[i].in_channels = c.in_channels
        descs[i].size = c.size
        descs[i].batch_normalize = int(c.batch_normalize)
        descs[i].stream_offset = offset
        descs[i].out_w = w.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        descs[i].out_b = b.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        offset += (4 if c.batch_normalize else 1) * c.filters
        offset += c.filters * c.in_channels * c.size * c.size

    rc = lib.pyt_load_weights(path.encode(), descs, len(convs), offset, n_threads)
    if rc != 0:
        raise WeightsError(
            f"native loader: {lib.pyt_strerror(rc).decode()} ({path})")
    return params


def load_weights(spec: ModelSpec, path: str, fold_bn: bool = True,
                 native: bool | None = None) -> Params:
    """One call: .weights file -> inference-ready params pytree (HWIO, BN folded).

    ``native=None`` tries the C++ fast path for the folded case and falls
    back to numpy; True requires it; False skips it."""
    if fold_bn and native is not False:
        try:
            params = load_weights_native(spec, path)
        except WeightsError:
            raise
        except Exception:
            params = None
        if params is not None:
            return params
        if native:
            raise RuntimeError("native weights loader unavailable")
    raw = read_weights_file(spec, path)
    return fold_batchnorm(spec, raw) if fold_bn else raw


# ---------------------------------------------------------------------------
# Writing (for synthetic-weights tests and darknet-format export)
# ---------------------------------------------------------------------------


def write_weights_file(
    spec: ModelSpec,
    raw: Mapping[int, Mapping[str, np.ndarray]],
    path: str,
    seen: int = 0,
    version: tuple[int, int, int] = (0, 2, 0),
) -> None:
    """Serialize raw (un-folded) params back to Darknet .weights format.

    The reference family optionally ships ``save_weights`` (SURVEY.md §2.1 #4);
    here it also powers the synthetic round-trip test (SURVEY.md §4.2.2)."""
    major, minor, revision = version
    chunks: list[bytes] = [np.array([major, minor, revision], dtype=np.int32).tobytes()]
    if major * 10 + minor >= 2:
        chunks.append(np.array([seen], dtype=np.uint64).tobytes())
    else:
        chunks.append(np.array([seen], dtype=np.int32).tobytes())

    for c in _conv_specs(spec):
        entry = raw[c.index]
        if c.batch_normalize:
            for key in ("bn_beta", "bn_gamma", "bn_mean", "bn_var"):
                chunks.append(np.asarray(entry[key], dtype=np.float32).tobytes())
        else:
            chunks.append(np.asarray(entry["b"], dtype=np.float32).tobytes())
        w = np.asarray(entry["w"], dtype=np.float32)
        # HWIO -> OIHW stream order
        chunks.append(np.ascontiguousarray(w.transpose(3, 2, 0, 1)).tobytes())

    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(b"".join(chunks))
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Synthetic initialization (offline testing: no pretrained assets needed)
# ---------------------------------------------------------------------------


def random_raw_params(spec: ModelSpec, seed: int = 0, scale: float = 0.05) -> RawParams:
    """He-style random raw params for every conv layer (tests/benchmarks)."""
    rng = np.random.default_rng(seed)
    raw: RawParams = {}
    for c in _conv_specs(spec):
        fan_in = c.in_channels * c.size * c.size
        w = rng.normal(0.0, np.sqrt(2.0 / fan_in), size=(c.size, c.size, c.in_channels, c.filters))
        entry: dict[str, np.ndarray] = {"w": w.astype(np.float32)}
        if c.batch_normalize:
            entry["bn_beta"] = rng.normal(0, scale, c.filters).astype(np.float32)
            entry["bn_gamma"] = (1.0 + rng.normal(0, scale, c.filters)).astype(np.float32)
            entry["bn_mean"] = rng.normal(0, scale, c.filters).astype(np.float32)
            entry["bn_var"] = (1.0 + np.abs(rng.normal(0, scale, c.filters))).astype(np.float32)
        else:
            entry["b"] = rng.normal(0, scale, c.filters).astype(np.float32)
        raw[c.index] = entry
    return raw


def equalize_raw_params(spec: ModelSpec, raw: RawParams, size: int | None = None,
                        iters: int = 12, seed: int = 7,
                        tol: float = 0.1) -> RawParams:
    """Variance-controlled synthetic weights (VERDICT r4 weak #2).

    Plain He-init compounds activation variance through deep stacks (every
    residual add sums two unit-variance branches; Darknet-53 has 23 of
    them), so a synthetic flagship saturates every head sigmoid to exactly
    1.0 and clamps every box to a border — two of the drift metric's three
    channels (box_p99_px, score_p99) go silently degenerate and every
    banked "0 px" bound was an artifact of that regime, not a measurement.

    This is LSUV-style variance equalization (Mishkin & Matas, arXiv
    1511.06422), run as whole-net sweeps with *factor propagation* instead
    of layer-sequentially: each sweep runs one small stats forward, reads
    every conv's observed post-activation *output* std ``s_i`` through the
    ``collect_conv_out_stats`` hook, then walks the graph in topo order
    tracking the multiplicative factor ``f`` by which each layer's output
    will change relative to the measurement, and scales each unbounded-
    activation conv's kernel by ``1/(s_i * f_in)`` so its new output std
    lands at ~1 *given the already-rescaled upstream*.  (Naive
    simultaneous division by ``s_i`` alone is unstable: the correction
    front moves one layer per sweep and the accumulated log-errors
    alternate in sign and grow binomially with depth — measured diverging
    to 1e5 stds on the 13-conv tiny.)  The propagation is exact along
    conv/pool/upsample chains for positively-homogeneous activations
    (leaky, linear; mish is near-homogeneous at large scale), approximate
    at route-concats and shortcut adds (geometric-mean factor), and the
    next sweep's fresh measurement corrects the residual.  Bounded
    (logistic) convs keep their kernels: their output std cannot be pushed
    to 1 by scaling, and the csp dialect's upstream LSUV already puts
    their pre-activation logits in the responsive range.

    Head logits at std ≈ 1 sit squarely in the sigmoid's responsive
    range: scores spread instead of pinning at exactly 1.0, box
    coordinates stop border-clamping, and bf16/int8 drift on synthetic
    weights exercises ALL THREE metric channels (the regime real weights
    inhabit — the healthy yolov3-tiny control of VERDICT r4).

    Pure per-conv kernel rescaling: the raw-params schema (BN stats,
    biases) is untouched, so the result still round-trips through the
    ``.weights`` writer and folds normally.

    Convergence (r5): ``iters`` is a CEILING — each sweep first checks the
    freshly-measured stds and stops once every unbounded conv's
    ``|log s_i|`` is within ``tol`` (shallow/leaky stacks converge in
    3-5 sweeps; yolov4x-mish's 207-layer mish stack needs ~8 because mish
    is only near-homogeneous, so each rescale shifts its operating point
    — measured: iters=4 left head scores compressed to 0.37-0.42
    / spread 0.029, converged sweeps spread them to 0.42-0.61 / 0.109).
    """
    import jax
    import jax.numpy as jnp

    from .config import (MaxPoolSpec, ReorgSpec, RouteSpec, ShortcutSpec,
                         UpsampleSpec, head_strides)
    from .models.darknet import build_forward

    if size is None:
        # Smallest comfortable size divisible by the deepest head stride
        # (p6 needs %64, p7 %128 — api._resolve_size semantics).
        mod = max(32, max(head_strides(spec)))
        size = max(mod, (256 + mod - 1) // mod * mod)
    hook = lambda i, t: jnp.std(t.astype(jnp.float32))
    fwd = jax.jit(build_forward(spec, collect_conv_out_stats=hook))
    rng = np.random.default_rng(seed)
    x = rng.random((1, size, size, 3), dtype=np.float32)
    raw = {i: dict(e) for i, e in raw.items()}
    unbounded = {l.index for l in spec.layers
                 if isinstance(l, ConvSpec) and l.activation != "logistic"}
    for _ in range(iters):
        _, stats = fwd(fold_batchnorm(spec, raw), x)
        s = {i: float(np.asarray(v)) for i, v in stats.items()}
        devs = [abs(np.log(s[i])) for i in unbounded
                if s.get(i, 0.0) > 1e-6]
        if devs and max(devs) < tol:
            break  # converged: every unbounded conv's output std ~1
        f: dict[int, float] = {}
        src = lambda j: 1.0 if j < 0 else f[j]
        for layer in spec.layers:
            i = layer.index
            if isinstance(layer, ConvSpec):
                si = s.get(i, 0.0)
                if layer.activation != "logistic" and si > 1e-6:
                    raw[i]["w"] = (raw[i]["w"] / (si * src(i - 1))
                                   ).astype(np.float32)
                    f[i] = 1.0 / si  # new out std ~1 vs measured si
                else:
                    f[i] = 1.0  # bounded output: std ~input-invariant
            elif isinstance(layer, RouteSpec):
                f[i] = float(np.exp(np.mean([np.log(src(j))
                                             for j in layer.layers])))
            elif isinstance(layer, ShortcutSpec):
                f[i] = float(np.sqrt(src(i - 1) * src(layer.from_layer)))
            elif isinstance(layer, (MaxPoolSpec, UpsampleSpec, ReorgSpec)):
                f[i] = src(i - 1)
            else:  # yolo/region: x passes through
                f[i] = src(i - 1)
    return raw
