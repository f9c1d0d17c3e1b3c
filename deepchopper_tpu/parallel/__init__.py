"""Distributed plane: mesh creation, shardings, multi-host init."""

from .mesh import (
    DATA_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    process_shard_info,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "process_shard_info",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
