"""Device-mesh construction and batch sharding for multi-chip inference.

The reference is single-process/single-device (SURVEY.md §2.3-2.4); its only
parallelism is batching on one GPU.  The TPU-native scale-out is declarative
GSPMD: a 1-D ``Mesh`` over the "batch" axis, inputs placed with a
``NamedSharding`` so each chip runs the full network on its batch shard, and
XLA inserts the ICI all-gather when the fixed-shape NMS results are pulled
back (BASELINE.json:5 "shards over TPU cores with outputs gathered over
ICI").  No NCCL/process groups/custom transport — the mesh IS the backend.

YOLOv3 is 62M params (~248 MB fp32) so parameters are replicated; tensor/
pipeline parallelism is deliberately out of scope (SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_batch_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over all (or given) devices, axis name "batch"."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devs), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) across the mesh; all other axes replicated."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of ``m`` >= ``n`` (batch padding for even sharding)."""
    return ((n + m - 1) // m) * m


def shard_batch(x, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over axis 0.

    The batch dimension must be divisible by the mesh size — callers pad with
    ``pad_to_multiple`` and drop the tail rows after gather."""
    return jax.device_put(x, batch_sharding(mesh))


def replicate_params(params, mesh: Mesh):
    """Replicate the (folded) params pytree onto every device in the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), params)
