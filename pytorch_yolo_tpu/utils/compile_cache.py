"""Persistent XLA compilation cache across processes.

Compiling the full-pipeline executable costs tens of seconds per shape
bucket on TPU (remote compile over the tunnel; PERF.md).  JAX ships a
content-addressed persistent cache — enabling it makes the *second* process
(restarted server, next CLI invocation, next eval run) skip every compile it
has seen before.  The reference has no analogue (torch eager has no compile
step); for a compiled-runtime framework this is basic serving hygiene.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pytorch_yolo_tpu", "xla")


def enable_compilation_cache(directory: str | None = None,
                             min_compile_time_secs: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache; returns the cache dir.

    Safe to call multiple times; executables faster to compile than
    ``min_compile_time_secs`` are not persisted (cache-write overhead would
    exceed the win)."""
    import jax

    directory = directory or _DEFAULT_DIR
    os.makedirs(directory, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    return directory
