"""Solvers: the functional NFOPP optimization engines."""

from .config import (  # noqa: F401
    SolverConfig,
    bench_mr_config,
    default_constrained_config,
    run_planner_config,
)
from .constrained import ConstrainedSolver, ConstrainedState, StepAux  # noqa: F401
from .holonomic import HolonomicSolver, HolonomicState  # noqa: F401
