"""Native (C++) runtime components, bound via ctypes.

Build on demand with :func:`ensure_built` (g++, no pybind11 needed); every
consumer falls back to the pure-numpy path when the toolchain or .so is
unavailable, so the framework never hard-requires a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "weights_loader.cpp")
_SO = os.path.join(_DIR, "_build", "libpyt_native.so")
_lock = threading.Lock()
_lib: "ctypes.CDLL | None | bool" = None  # None = untried, False = unavailable


class LayerDescStruct(ctypes.Structure):
    _fields_ = [
        ("filters", ctypes.c_int32),
        ("in_channels", ctypes.c_int32),
        ("size", ctypes.c_int32),
        ("batch_normalize", ctypes.c_int32),
        ("stream_offset", ctypes.c_int64),
        ("out_w", ctypes.POINTER(ctypes.c_float)),
        ("out_b", ctypes.POINTER(ctypes.c_float)),
    ]


def _is_fresh(so: str) -> bool:
    """True if the built .so is at least as new as its source file.

    A missing source file (e.g. a deployment shipping only the binary)
    counts as fresh — there is nothing to be stale against."""
    if not os.path.exists(_SRC):
        return True
    try:
        return os.path.getmtime(so) >= os.path.getmtime(_SRC)
    except OSError:
        return False


def ensure_built(force: bool = False) -> str | None:
    """Compile the native library if needed; returns its path or None.

    Rebuilds when the .so is missing OR older than weights_loader.cpp, so an
    edited source can never be silently shadowed by a stale binary."""
    if os.path.exists(_SO) and _is_fresh(_SO) and not force:
        return _SO
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError) as e:
        log.debug("native build failed: %s", e)
        return None
    return _SO


def load_library(build: bool = True) -> "ctypes.CDLL | None":
    """ctypes handle to the native library (builds it on first use)."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        if os.path.exists(_SO) and _is_fresh(_SO):
            path = _SO
        else:
            path = ensure_built() if build else None
        if path is None:
            _lib = False
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            log.debug("native load failed: %s", e)
            _lib = False
            return None
        lib.pyt_load_weights.restype = ctypes.c_int
        lib.pyt_load_weights.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(LayerDescStruct), ctypes.c_int,
            ctypes.c_int64, ctypes.c_int]
        lib.pyt_probe.restype = ctypes.c_int
        lib.pyt_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint64)]
        lib.pyt_strerror.restype = ctypes.c_char_p
        lib.pyt_strerror.argtypes = [ctypes.c_int]
        _lib = lib
        return lib
