"""Device-mesh utilities: shard the problem batch over TPU chips.

The NFOPP problem batch is embarrassingly parallel (SURVEY.md §2: the reference
has no distributed code; scale-out is new design): each problem owns its field
params, multipliers, replay buffer, and RNG stream. The parallelism recipe is
therefore pure data parallelism over the batch axis of every state leaf:

    mesh = problem_mesh()                      # 1-D mesh over all chips
    states = shard_batch(states, mesh)         # NamedSharding('problems')
    run = jax.jit(jax.vmap(solver.step, ...))  # XLA partitions along the batch

No collectives are needed in the hot loop; cross-problem reductions (metrics)
compile to psum over ICI via `mean_over_problems`. Multi-host setup goes through
`initialize_distributed` (jax.distributed) and the same code path — the mesh
then spans all hosts' devices and each host feeds its addressable shard.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "problem_mesh",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "mean_over_problems",
    "initialize_distributed",
]

BATCH_AXIS = "problems"


def problem_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D mesh over the given (default: all) devices, axis name 'problems'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) axis over the mesh."""
    return NamedSharding(mesh, PartitionSpec(BATCH_AXIS))


def shard_batch(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf of a batched pytree with its leading axis sharded.

    Leaf shapes must have a leading batch dim divisible by mesh size. Scalars /
    unbatched leaves are not expected here — batch your state first with vmap'd
    init.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh (for shared scene data)."""
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def mean_over_problems(values: jax.Array) -> jax.Array:
    """Batch-mean that compiles to an ICI psum when the input is sharded."""
    return jax.numpy.mean(values, axis=0)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host process-group init (thin jax.distributed wrapper).

    On single-host runs this is a no-op; on a pod slice call it once per host
    before creating the mesh, then `problem_mesh()` spans the full slice.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
