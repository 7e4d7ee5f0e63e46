"""Parallel scale-out: mesh sharding of the problem batch, multi-host init."""

from .mesh import (  # noqa: F401
    BATCH_AXIS,
    batch_sharding,
    initialize_distributed,
    mean_over_problems,
    problem_mesh,
    replicate,
    shard_batch,
)
from .batch import BatchPlanner  # noqa: F401
