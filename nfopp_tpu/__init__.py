"""nfopp_tpu — TPU-native Neural Field Optimal Path Planner framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
MisterMap/pytorch-motion-planner (reference mounted read-only at /root/reference):
simultaneous online training of a neural occupancy field and gradient-based SE(2)
trajectory optimization with Lagrangian constraint handling, batched over thousands
of planning problems and sharded across a TPU device mesh.

Design stance (vs the reference, see SURVEY.md):
  * the reference mutates torch tensors in place and round-trips device<->host every
    step (`nerf_opt_planner.py:87,99,102,125`); here the entire solver step is a pure
    function over a `SolverState` pytree, jitted once and scanned on device.
  * collision oracles are device-side pure functions (analytic or bitmap), so the
    whole optimize loop runs without host sync.
  * scale comes from `vmap` over a problem batch + sharding the batch axis over a
    `jax.sharding.Mesh` (see `nfopp_tpu.parallel`).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import models  # noqa: F401
from . import worlds  # noqa: F401
from . import solver  # noqa: F401
from . import parallel  # noqa: F401
from . import astar  # noqa: F401
from . import bench  # noqa: F401
from . import baselines  # noqa: F401
from . import service  # noqa: F401
from . import utils  # noqa: F401
