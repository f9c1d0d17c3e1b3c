"""Device mesh + sharding helpers (the framework's distributed plane).

The reference's only model-side parallelism is DDP data parallelism
(reference: configs/trainer/ddp.yaml:1-9, deepchopper/data/only_fq.py:197-202).
TPU-natively that is a 1-axis `jax.sharding.Mesh` with the batch dimension
sharded over it: XLA inserts the gradient all-reduce (psum over ICI) during
jit lowering — no NCCL-style calls. Multi-host runs initialize
`jax.distributed` and keep per-host output shards, merged at the chop stage
exactly like the reference merges per-rank `.pt` dirs
(reference: deepchopper/models/callbacks.py:25, cli.py:181).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-axis data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, np.ndarray], mesh: Mesh, axis_name: str = DATA_AXIS) -> dict[str, Any]:
    """Device-put a host batch with the batch axis sharded over the mesh.

    The batch dimension must be divisible by the mesh size — the bucketed
    batcher guarantees this when `tokens_per_batch` is a multiple of
    mesh_size * width (engine pads partial batches up).
    """
    sharding = batch_sharding(mesh, axis_name)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.device_put(tree, sharding)


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX (reference capability: Lightning DDP init).

    Arguments fall back to the `DC_COORDINATOR` / `DC_NUM_PROCESSES` /
    `DC_PROCESS_ID` environment variables (set by the launcher, one process
    per host), and on a pod slice plain `jax.distributed.initialize()`
    auto-detection applies. Returns True when a multi-process runtime was
    initialized. No-op (False) for single-process runs.
    """
    import os

    coordinator = coordinator or os.environ.get("DC_COORDINATOR")
    if num_processes is None and os.environ.get("DC_NUM_PROCESSES"):
        num_processes = int(os.environ["DC_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DC_PROCESS_ID"):
        process_id = int(os.environ["DC_PROCESS_ID"])
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    return False


def process_shard_info() -> tuple[int, int]:
    """(process_index, process_count) — used to name per-host output shards."""
    return jax.process_index(), jax.process_count()
