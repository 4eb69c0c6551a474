"""On-device letterbox preprocessing: uint8 image -> network input tensor.

Replaces the reference's host-side ``letterbox_image``/``prep_image``
(SURVEY.md §2.1 #7): OpenCV resize + gray-pad + /255 + BGR->RGB + HWC->CHW on
the CPU, then an H2D copy of the float tensor.  TPU-native version instead
ships the *uint8 bytes* to the device (3-4x less PCIe/H2D traffic) and runs
resize/pad/normalize as one jitted XLA program fused with the network forward
— images go bytes-to-boxes without host round-trips (BASELINE.json:5).

Letterbox contract ([A]+[B], SURVEY.md §1 L1):
  * scale = min(S/W0, S/H0); new sizes truncated toward zero (int()).
  * bilinear resize, antialias off (pin exact reference interpolation during
    re-verification — SURVEY.md §7 hard parts).
  * paste centered into an S x S canvas filled with gray 128.
  * output float32 in [0,1], RGB, NHWC (TPU layout; the reference's CHW is
    a torch convention with no meaning here).

Shapes are static per (H0, W0, S): each distinct source resolution compiles
once and is cached (video streams and fixed-size datasets hit one cache
entry; SURVEY.md §7 P6 shape-bucketing note).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class LetterboxGeometry(NamedTuple):
    """Static geometry of a letterbox placement (host-side Python ints/floats)."""

    scale: float
    new_w: int
    new_h: int
    pad_x: int
    pad_y: int
    orig_w: int
    orig_h: int
    size: "int | tuple[int, int]"

    @property
    def out_hw(self) -> tuple[int, int]:
        return _size_hw(self.size)


def _size_hw(size: "int | tuple[int, int]") -> tuple[int, int]:
    """Normalize a network input size: int S -> (S, S); (H, W) passes through."""
    if isinstance(size, tuple):
        return size
    return (size, size)


def letterbox_geometry(orig_h: int, orig_w: int,
                       size: "int | tuple[int, int]") -> LetterboxGeometry:
    """Compute the (static) resize/pad geometry for an (H0, W0) -> (Sh, Sw)
    letterbox.  ``size`` may be a square int or an (H, W) pair (rectangular
    network input)."""
    sh, sw = _size_hw(size)
    scale = min(sw / orig_w, sh / orig_h)
    new_w = int(orig_w * scale)
    new_h = int(orig_h * scale)
    return LetterboxGeometry(
        scale=scale,
        new_w=new_w,
        new_h=new_h,
        pad_x=(sw - new_w) // 2,
        pad_y=(sh - new_h) // 2,
        orig_w=orig_w,
        orig_h=orig_h,
        size=size,
    )


@functools.partial(jax.jit, static_argnames=("size", "bgr", "fill", "method"))
def letterbox_image(
    img: jnp.ndarray,
    size: "int | tuple[int, int]",
    bgr: bool = True,
    fill: float = 128.0,
    method: str = "linear",
) -> jnp.ndarray:
    """Letterbox one (H0, W0, 3) uint8 image to (Sh, Sw, 3) float32 in [0,1].

    ``bgr=True`` flips the channel order (OpenCV decode convention).
    ``method``: "linear" (default) or "cubic" (Keys bicubic) — the reference
    family uses either cv2.INTER_LINEAR or INTER_CUBIC depending on the repo;
    both are exposed so parity can be pinned during re-verification
    (SURVEY.md §7 hard parts)."""
    h0, w0 = img.shape[0], img.shape[1]
    geo = letterbox_geometry(h0, w0, size)
    sh, sw = geo.out_hw

    x = img.astype(jnp.float32)
    if bgr:
        x = x[..., ::-1]
    resized = jax.image.resize(x, (geo.new_h, geo.new_w, 3), method=method, antialias=False)
    if method == "cubic":
        # bicubic overshoots; the uint8 reference clamps implicitly
        resized = jnp.clip(resized, 0.0, 255.0)
    canvas = jnp.full((sh, sw, 3), fill, dtype=jnp.float32)
    canvas = lax.dynamic_update_slice(canvas, resized, (geo.pad_y, geo.pad_x, 0))
    return canvas / 255.0


def letterbox_host(
    img: "np.ndarray",
    size: "int | tuple[int, int]",
    bgr: bool = True,
    fill: float = 128.0,
    method: str = "linear",
    out_dtype: str = "float32",
) -> tuple["np.ndarray", LetterboxGeometry]:
    """Host-side letterbox: (H0, W0, 3) uint8 -> ((Sh, Sw, 3) f32 [0,1], geometry).

    Same math as :func:`letterbox_image` (float32 resize, half-pixel centers,
    no antialias) but on the CPU — used when source shapes are heterogeneous
    (e.g. COCO evaluation) so ONE compiled pipeline serves every image
    instead of one per unique source shape.  Uses OpenCV's C++ resize when
    available, else a numpy fallback.

    ``out_dtype="uint8"`` returns the rounded 0..255 canvas instead (the
    /255 then happens on-device in :meth:`api.Detector.detect_prepared`) —
    quarter the H2D bytes, and closer to the reference's cv2-on-uint8
    semantics (rounding error <= 0.5/255 per pixel; PERF.md roadmap #1)."""
    import numpy as np

    h0, w0 = img.shape[:2]
    geo = letterbox_geometry(h0, w0, size)
    sh, sw = geo.out_hw
    x = img.astype(np.float32)
    if bgr:
        x = x[..., ::-1]
    try:
        import cv2

        interp = cv2.INTER_LINEAR if method == "linear" else cv2.INTER_CUBIC
        resized = cv2.resize(x, (geo.new_w, geo.new_h), interpolation=interp)
    except ImportError:
        resized = _numpy_bilinear(x, geo.new_h, geo.new_w)
    if method == "cubic":
        resized = np.clip(resized, 0.0, 255.0)
    canvas = np.full((sh, sw, 3), fill, dtype=np.float32)
    canvas[geo.pad_y : geo.pad_y + geo.new_h, geo.pad_x : geo.pad_x + geo.new_w] = resized
    if out_dtype == "uint8":
        return np.clip(np.round(canvas), 0, 255).astype(np.uint8), geo
    return canvas / 255.0, geo


def _numpy_bilinear(img, out_h: int, out_w: int):
    """Half-pixel-center bilinear resize (float32, no antialias)."""
    import numpy as np

    in_h, in_w = img.shape[:2]
    sy, sx = in_h / out_h, in_w / out_w
    ys = (np.arange(out_h) + 0.5) * sy - 0.5
    xs = (np.arange(out_w) + 0.5) * sx - 0.5
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0c, y1c = np.clip(y0, 0, in_h - 1), np.clip(y0 + 1, 0, in_h - 1)
    x0c, x1c = np.clip(x0, 0, in_w - 1), np.clip(x0 + 1, 0, in_w - 1)
    top = img[y0c][:, x0c] * (1 - wx) + img[y0c][:, x1c] * wx
    bot = img[y1c][:, x0c] * (1 - wx) + img[y1c][:, x1c] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("size", "bgr", "fill", "method"))
def letterbox_batch(
    imgs: jnp.ndarray,
    size: int,
    bgr: bool = True,
    fill: float = 128.0,
    method: str = "linear",
) -> jnp.ndarray:
    """Letterbox a uniform batch (N, H0, W0, 3) uint8 -> (N, S, S, 3) f32."""
    fn = functools.partial(letterbox_image, size=size, bgr=bgr, fill=fill, method=method)
    return jax.vmap(fn)(imgs)
