"""Stateful planner API + config-driven factory.

`NFOPPlanner` wraps the functional solvers behind the reference's
`ContinuousPlanner` interface (continuous_planner.py:4-27): init / step /
get_path / set_boundaries / update_goal_point / update_start_point — so code
written against the reference maps 1:1. Internally it is a thin shell holding
a state pytree and jitted pure functions (compiled once, reused across init
calls).

`PlannerFactory` + `DEFAULT_PARAMETERS` mirror planner_factory.py:11-77: the
same AttributeDict schema (collision_model / collision_optimizer /
trajectory_optimizer / planner / trajectory_initializer sections) builds a
solver, so the reference's JSON override mechanism ("nfomp" sections in
benchmark settings) carries over unchanged.
"""
from __future__ import annotations

from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..models.onf import ONFConfig
from ..utils.config import AttributeDict
from .config import SolverConfig
from .constrained import ConstrainedSolver
from .holonomic import HolonomicSolver

__all__ = ["NFOPPlanner", "PlannerFactory", "DEFAULT_PARAMETERS", "config_from_parameters"]


DEFAULT_PARAMETERS = AttributeDict(
    trajectory_length=100,
    collision_model=AttributeDict(
        mean=0.0, sigma=10.0, use_cos=True, bias=True, use_normal_init=True,
        angle_encoding=False, name="ONF",
    ),
    collision_optimizer=AttributeDict(lr=1e-2, betas=(0.9, 0.9)),
    trajectory_optimizer=AttributeDict(lr=1e-2, betas=(0.9, 0.9)),
    trajectory_initializer=AttributeDict(name="TrajectoryInitializer", resolution=0.05),
    planner=AttributeDict(
        name="ConstrainedNFOPPlanner",
        trajectory_random_offset=0.02,
        collision_weight=1.0,
        velocity_hessian_weight=0.5,
        random_field_points=10,
        init_collision_iteration=0,
        constraint_deltas_weight=0.2,
        multipliers_lr=0.001,
        init_collision_points=100,
        reparametrize_trajectory_freq=10,
        optimize_collision_model_freq=1,
        angle_weight=0.5,
        boundary_weight=1.0,
        collision_multipliers_lr=1e-3,
    ),
)

# planner-section keys -> SolverConfig fields (names differing between the two)
_PLANNER_KEY_MAP = {
    "trajectory_random_offset": "trajectory_random_offset",
    "collision_weight": "collision_weight",
    "velocity_hessian_weight": "velocity_hessian_weight",
    "random_field_points": "random_field_points",
    "init_collision_iteration": "init_collision_iteration",
    "init_collision_points": "init_collision_points",
    "reparametrize_trajectory_freq": "reparametrize_trajectory_freq",
    "optimize_collision_model_freq": "optimize_collision_model_freq",
    "constraint_deltas_weight": "constraint_deltas_weight",
    "multipliers_lr": "multipliers_lr",
    "collision_multipliers_lr": "collision_multipliers_lr",
    "angle_weight": "angle_weight",
    "angle_offset": "angle_offset",
    "boundary_weight": "boundary_weight",
    "direction_delta_weight": "direction_delta_weight",
    "collision_beta": "collision_beta",
    "course_random_offset": "course_random_offset",
    "collision_point_count": "collision_point_count",
    "collision_loss_koef": "collision_loss_koef",
}


def config_from_parameters(parameters: Mapping) -> SolverConfig:
    """Reference AttributeDict parameter schema -> SolverConfig."""
    p = AttributeDict(parameters)
    model = p.collision_model
    onf = ONFConfig(
        mean=float(model.get("mean", 0.0)),
        sigma=float(model.get("sigma", 1.0)),
        use_cos=bool(model.get("use_cos", True)),
        use_normal_init=bool(model.get("use_normal_init", False)),
        bias=bool(model.get("bias", True)),
        angle_encoding=bool(model.get("angle_encoding", False)),
    )
    kwargs: dict[str, Any] = {
        "trajectory_length": int(p.get("trajectory_length", 100)),
        "onf": onf,
        "collision_lr": float(p.collision_optimizer.get("lr", 1e-2)),
        "collision_betas": tuple(p.collision_optimizer.get("betas", (0.9, 0.9))),
        "trajectory_lr": float(p.trajectory_optimizer.get("lr", 1e-2)),
        "trajectory_betas": tuple(p.trajectory_optimizer.get("betas", (0.9, 0.9))),
    }
    for src, dst in _PLANNER_KEY_MAP.items():
        if src in p.get("planner", {}):
            kwargs[dst] = type(SolverConfig._field_defaults[dst])(p.planner[src])
    init_cfg = p.get("trajectory_initializer", {})
    if init_cfg:
        kwargs["init_angles_with_trajectory"] = bool(
            init_cfg.get("init_angles_with_trajectory", False)
        )
    return SolverConfig(**kwargs)


class NFOPPlanner:
    """Stateful front end with the reference `ContinuousPlanner` interface.

    `initial_trajectory_fn(start, goal, length) -> [length, d]` optionally
    overrides the straight-line initializer (e.g. the host A* initializer).
    """

    def __init__(
        self,
        solver: ConstrainedSolver | HolonomicSolver,
        oracle_params: Any,
        seed: int = 0,
        initial_trajectory_fn: Callable[[np.ndarray, np.ndarray, int], np.ndarray] | None = None,
    ):
        self._solver = solver
        self._oracle_params = oracle_params
        self._key = jax.random.PRNGKey(seed)
        self._initial_trajectory_fn = initial_trajectory_fn
        self._state = None
        # host-side mirror of state.step_count % freq: run()'s static schedule
        # is only valid entering aligned (see ConstrainedSolver.run)
        self._steps_since_reset = 0
        self._jit_run = jax.jit(solver.run, static_argnums=(2, 3))
        self._jit_update_goal = jax.jit(solver.update_goal)
        self._jit_update_start = jax.jit(solver.update_start)

    @property
    def state(self):
        return self._state

    @property
    def solver(self):
        return self._solver

    def update_oracle(self, oracle_params: Any) -> None:
        """Swap world data (live obstacle updates in service mode)."""
        self._oracle_params = oracle_params

    # ------------------------------------------- ContinuousPlanner interface

    def init(self, start_point, goal_point, boundaries) -> None:
        self._key, init_key = jax.random.split(self._key)
        trajectory = None
        if self._initial_trajectory_fn is not None:
            trajectory = self._initial_trajectory_fn(
                np.asarray(start_point), np.asarray(goal_point),
                self._solver.config.trajectory_length,
            )
        self._state = self._solver.init_state(
            init_key,
            jnp.asarray(start_point, jnp.float32),
            jnp.asarray(goal_point, jnp.float32),
            jnp.asarray(boundaries, jnp.float32),
            self._oracle_params,
            trajectory=trajectory,
        )
        self._steps_since_reset = 0

    def step(self, num_steps: int = 1):
        """Advance the solve; returns the per-step aux diagnostics."""
        freq = self._solver.config.reparametrize_trajectory_freq
        aligned = freq <= 1 or self._steps_since_reset % freq == 0
        self._state, aux = self._jit_run(
            self._state, self._oracle_params, num_steps, aligned
        )
        self._steps_since_reset += num_steps
        return aux

    def get_path(self) -> np.ndarray:
        return np.asarray(self._solver.full_trajectory(self._state))

    def set_boundaries(self, boundaries) -> None:
        self._state = self._solver.set_boundaries(
            self._state, jnp.asarray(boundaries, jnp.float32)
        )
        self._steps_since_reset = 0  # set_boundaries resets step_count

    def update_goal_point(self, goal_point) -> None:
        self._state = self._jit_update_goal(self._state, jnp.asarray(goal_point, jnp.float32))
        self._steps_since_reset = 0  # update_goal resets step_count

    def update_start_point(self, start_point) -> None:
        self._state = self._jit_update_start(self._state, jnp.asarray(start_point, jnp.float32))
        self._steps_since_reset = 0  # update_start resets step_count


class PlannerFactory:
    """Builds planners from the reference's parameter schema."""

    @staticmethod
    def make_constrained_onf_planner(
        oracle_fn, oracle_params, parameters: Mapping | None = None, seed: int = 0,
        initial_trajectory_fn=None,
    ) -> NFOPPlanner:
        """SE(2) constrained planner (planner_factory.py:62-77 equivalent)."""
        if parameters is None:
            parameters = DEFAULT_PARAMETERS
        config = config_from_parameters(parameters)
        solver = ConstrainedSolver(config, oracle_fn)
        return NFOPPlanner(solver, oracle_params, seed, initial_trajectory_fn)

    @staticmethod
    def make_onf_planner(
        oracle_fn, oracle_params, parameters: Mapping | None = None, seed: int = 0
    ) -> NFOPPlanner:
        """Holonomic planner with the reference's hard-coded demo setup
        (planner_factory.py:50-60) unless parameters are given."""
        if parameters is None:
            config = SolverConfig(
                # ONF(1.5, 1): use_normal_init defaults False in the reference
                # ctor (onf_model.py:8) -> U(-1/sqrt(2), 1/sqrt(2)) encoding init
                onf=ONFConfig(mean=1.5, sigma=1.0, use_cos=False,
                              use_normal_init=False, angle_encoding=False),
                collision_lr=1e-3,
                collision_betas=(0.9, 0.9),
                trajectory_lr=1e-2,
                trajectory_betas=(0.9, 0.999),
                trajectory_random_offset=0.02,
                collision_weight=0.01,
                velocity_hessian_weight=3.0,
                random_field_points=10,
                init_collision_iteration=400,
            )
        else:
            config = config_from_parameters(parameters)
        if config.onf.angle_encoding:
            config = config._replace(onf=config.onf._replace(angle_encoding=False))
        solver = HolonomicSolver(config, oracle_fn)
        return NFOPPlanner(solver, oracle_params, seed)
