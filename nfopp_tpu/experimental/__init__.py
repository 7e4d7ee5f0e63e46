"""TPU-falsified structural levers, quarantined from the production solver.

Everything in this package was built, tested, and measured SLOWER than the
production step path on TPU v5e (BASELINE_MEASURED.md keeps the full
falsification table). It exists so the measured conclusions stay reproducible
and because the Pallas kernels are the right shape for large-M regimes the
current workload does not hit.

Support policy: NOT part of the stable API — may change or disappear with the
measurement story. The production solver (`nfopp_tpu.solver`) never imports
from here.
"""

from .solver import ExperimentalConstrainedSolver  # noqa: F401
