"""Solvers: the functional NFOPP optimization engines."""

from .config import (  # noqa: F401
    SolverConfig,
    bench_mr_config,
    default_constrained_config,
    run_planner_config,
)
from .constrained import ConstrainedSolver, ConstrainedState, StepAux  # noqa: F401
from .holonomic import HolonomicSolver, HolonomicState  # noqa: F401
from .api import (  # noqa: F401
    DEFAULT_PARAMETERS,
    NFOPPlanner,
    PlannerFactory,
    config_from_parameters,
)
from .tracking import TrackingResult, evaluate_path, run_with_tracking  # noqa: F401
