from .sharding import (
    BATCH_AXIS,
    batch_sharding,
    make_batch_mesh,
    pad_to_multiple,
    replicate_params,
    replicated,
    shard_batch,
)

__all__ = [
    "BATCH_AXIS",
    "batch_sharding",
    "make_batch_mesh",
    "pad_to_multiple",
    "replicate_params",
    "replicated",
    "shard_batch",
]
