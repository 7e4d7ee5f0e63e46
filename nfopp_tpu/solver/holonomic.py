"""Holonomic (2-D) NFOPP solver — equivalent of the reference base planner.

The reference's `NERFOptPlanner` (nerf_opt_planner.py) optimizes a [N, 2]
trajectory with loss = sum-of-squared-deltas + collision energy from the field
(:157-169); no constraint multipliers, plain lerp reparametrization (:220-248).
Shares the field-training pipeline and config with the constrained solver.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.onf import init_onf_params, onf_apply
from ..ops.hessian import inverse_velocity_hessian
from ..ops.losses import distance_loss, softplus_beta
from ..ops.reparametrize import reparametrize_xy
from ..ops.sampling import uniform_box_points
from .config import SolverConfig
from .constrained import StepAux
from .field import field_loss_and_grad, sample_field_points
from .schedule import scan_chunked

__all__ = ["HolonomicState", "HolonomicSolver"]

OracleFn = Callable[[Any, jnp.ndarray], jnp.ndarray]


class HolonomicState(NamedTuple):
    trajectory: jnp.ndarray  # [N, 2]
    field_params: dict
    field_opt_state: Any
    traj_opt_state: Any
    buffer_points: jnp.ndarray  # [K, 2]
    buffer_ages: jnp.ndarray  # [K]
    prev_trajectory: jnp.ndarray  # [N, 2]
    start: jnp.ndarray  # [2]
    goal: jnp.ndarray  # [2]
    bounds: jnp.ndarray  # [4]
    key: jax.Array
    step_count: jnp.ndarray


class HolonomicSolver:
    """See `ConstrainedSolver`; this is the 2-D unconstrained variant."""

    def __init__(self, config: SolverConfig, oracle_fn: OracleFn):
        if config.onf.angle_encoding:
            raise ValueError("holonomic solver requires angle_encoding=False in ONFConfig")
        self.config = config
        self.oracle_fn = oracle_fn
        self._inv_hessian = jnp.asarray(
            inverse_velocity_hessian(config.trajectory_length, config.velocity_hessian_weight)
        )
        b1, b2 = config.collision_betas
        self._field_opt = optax.adam(config.collision_lr, b1=b1, b2=b2, eps=config.adam_eps)
        b1, b2 = config.trajectory_betas
        self._traj_opt = optax.adam(config.trajectory_lr, b1=b1, b2=b2, eps=config.adam_eps)

    def initial_trajectory(self, start: jnp.ndarray, goal: jnp.ndarray) -> jnp.ndarray:
        """Straight line between the endpoints (ref _init_trajectory :189-195)."""
        m = self.config.trajectory_length + 2
        x = jnp.linspace(start[0], goal[0], m)[1:-1]
        y = jnp.linspace(start[1], goal[1], m)[1:-1]
        return jnp.stack([x, y], axis=1).astype(jnp.float32)

    def init_state(
        self,
        key: jax.Array,
        start: jnp.ndarray,
        goal: jnp.ndarray,
        bounds: jnp.ndarray,
        oracle_params: Any,
        trajectory: jnp.ndarray | None = None,
    ) -> HolonomicState:
        cfg = self.config
        start = jnp.asarray(start, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        bounds = jnp.asarray(bounds, jnp.float32)
        key, k_field, k_buffer, k_pretrain = jax.random.split(key, 4)
        if trajectory is None:
            trajectory = self.initial_trajectory(start, goal)
        trajectory = jnp.asarray(trajectory, jnp.float32)
        field_params = init_onf_params(k_field, cfg.onf)
        state = HolonomicState(
            trajectory=trajectory,
            field_params=field_params,
            field_opt_state=self._field_opt.init(field_params),
            traj_opt_state=self._traj_opt.init(trajectory),
            buffer_points=uniform_box_points(k_buffer, cfg.collision_point_count, bounds, False),
            buffer_ages=jnp.zeros(cfg.collision_point_count, jnp.float32),
            prev_trajectory=trajectory,
            start=start,
            goal=goal,
            bounds=bounds,
            key=key,
            step_count=jnp.zeros((), jnp.int32),
        )
        if cfg.init_collision_iteration > 0:
            state = self._pretrain_field(state, oracle_params, k_pretrain)
        return state

    def _pretrain_field(self, state, oracle_params, key):
        cfg = self.config

        def body(i, carry):
            params, opt_state, key = carry
            key, k_pts = jax.random.split(key)
            points = uniform_box_points(k_pts, cfg.init_collision_points, state.bounds, False)
            truth = self.oracle_fn(oracle_params, points)
            _, grads = field_loss_and_grad(cfg, params, points, truth)
            updates, opt_state = self._field_opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, key

        params, opt_state, _ = jax.lax.fori_loop(
            0, cfg.init_collision_iteration, body,
            (state.field_params, state.field_opt_state, key),
        )
        return state._replace(field_params=params, field_opt_state=opt_state)

    def full_trajectory(self, state: HolonomicState) -> jnp.ndarray:
        return jnp.concatenate([state.start[None], state.trajectory, state.goal[None]], axis=0)

    def step(self, state: HolonomicState, oracle_params: Any) -> tuple[HolonomicState, StepAux]:
        cfg = self.config
        key, k_field, k_traj = jax.random.split(state.key, 3)
        state = state._replace(key=key)

        if cfg.optimize_collision_model_freq == 1:
            state, field_loss = self._field_step(state, oracle_params, k_field)
        else:
            do_field = state.step_count % cfg.optimize_collision_model_freq == 0
            state, field_loss = jax.lax.cond(
                do_field,
                lambda s: self._field_step(s, oracle_params, k_field),
                lambda s: (s, jnp.zeros((), jnp.float32)),
                state,
            )

        state, traj_loss = self._trajectory_step(state, k_traj)

        do_reparam = state.step_count % cfg.reparametrize_trajectory_freq == 0
        state = jax.lax.cond(do_reparam, self._reparametrize, lambda s: s, state)

        state = state._replace(step_count=state.step_count + 1)
        return state, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def step_static(self, state, oracle_params, with_reparam: bool,
                    with_field: bool | None = None):
        """See ConstrainedSolver.step_static."""
        cfg = self.config
        key, k_field, k_traj = jax.random.split(state.key, 3)
        state = state._replace(key=key)
        if with_field is False:
            field_loss = jnp.zeros((), jnp.float32)
        elif with_field is True or cfg.optimize_collision_model_freq == 1:
            state, field_loss = self._field_step(state, oracle_params, k_field)
        else:
            do_field = state.step_count % cfg.optimize_collision_model_freq == 0
            state, field_loss = jax.lax.cond(
                do_field,
                lambda s: self._field_step(s, oracle_params, k_field),
                lambda s: (s, jnp.zeros((), jnp.float32)),
                state,
            )
        state, traj_loss = self._trajectory_step(state, k_traj)
        if with_reparam:
            state = self._reparametrize(state)
        state = state._replace(step_count=state.step_count + 1)
        return state, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def _field_step(self, state, oracle_params, key):
        cfg = self.config
        sample = sample_field_points(
            cfg, key, state.prev_trajectory, state.buffer_points,
            state.buffer_ages, state.field_params, state.bounds,
        )
        truth = self.oracle_fn(oracle_params, sample.train_points)
        loss, grads = field_loss_and_grad(cfg, state.field_params, sample.train_points, truth)
        updates, opt_state = self._field_opt.update(grads, state.field_opt_state, state.field_params)
        params = optax.apply_updates(state.field_params, updates)
        return (
            state._replace(
                field_params=params,
                field_opt_state=opt_state,
                buffer_points=sample.buffer_points,
                buffer_ages=sample.buffer_ages,
                prev_trajectory=state.trajectory,
            ),
            loss,
        )

    def trajectory_loss(self, trajectory, field_params, start, goal, t):
        """distance + collision_weight * sum(softplus(field)) at segment samples
        (ref trajectory_loss :157-159, collision loss :166-169)."""
        cfg = self.config
        full = jnp.concatenate([start[None], trajectory, goal[None]], axis=0)
        positions = trajectory[1:] * (1.0 - t) + trajectory[:-1] * t
        logits = onf_apply(field_params, positions, cfg.onf)
        collision = jnp.sum(softplus_beta(logits, 1.0))
        return distance_loss(full) + collision * cfg.collision_weight

    def _trajectory_step(self, state, key):
        cfg = self.config
        n = cfg.trajectory_length
        t = jax.random.uniform(key, (n - 1, 1), jnp.float32)
        loss, traj_grad = jax.value_and_grad(self.trajectory_loss)(
            state.trajectory, state.field_params, state.start, state.goal, t
        )
        traj_grad = self._inv_hessian @ traj_grad
        updates, opt_state = self._traj_opt.update(traj_grad, state.traj_opt_state, state.trajectory)
        trajectory = optax.apply_updates(state.trajectory, updates)
        return state._replace(trajectory=trajectory, traj_opt_state=opt_state), loss

    def _reparametrize(self, state: HolonomicState) -> HolonomicState:
        return state._replace(trajectory=reparametrize_xy(self.full_trajectory(state)))

    def _static_field_stride(self) -> int:
        """See ConstrainedSolver._static_field_stride."""
        s = self.config.optimize_collision_model_freq
        freq = self.config.reparametrize_trajectory_freq
        return s if s > 1 and freq % s == 0 else 1

    def run(self, state, oracle_params, num_steps: int,
            allow_static: bool = True):
        """Statically-scheduled scan when possible (see ConstrainedSolver.run;
        allow_static=False forces the dynamic schedule for misaligned entry)."""
        freq = self.config.reparametrize_trajectory_freq

        def dyn_body(carry, _):
            return self.step(carry, oracle_params)

        if freq <= 1 or num_steps % freq != 0 or not allow_static:
            return jax.lax.scan(dyn_body, state, None, length=num_steps)

        stride = self._static_field_stride()
        if stride > 1:
            step_fn = lambda s, r, f: self.step_static(
                s, oracle_params, with_reparam=r, with_field=f)
        else:
            step_fn = lambda s, r, f: self.step_static(
                s, oracle_params, with_reparam=r)
        state, aux = scan_chunked(
            step_fn, state, num_steps, freq,
            self.config.scan_unroll, self.config.outer_scan_unroll,
            field_stride=stride,
        )
        aux = jax.tree_util.tree_map(
            lambda x: x.reshape((num_steps,) + x.shape[2:]), aux
        )
        return state, aux

    def update_goal(self, state: HolonomicState, goal: jnp.ndarray) -> HolonomicState:
        """Ref nerf_opt_planner.py:202-209 (no +1 offset in the base class)."""
        goal = jnp.asarray(goal, jnp.float32)
        dist = jnp.sum((state.trajectory - goal[None]) ** 2, axis=1)
        min_index = jnp.argmin(dist)
        idx = jnp.arange(state.trajectory.shape[0])
        trajectory = jnp.where((idx >= min_index)[:, None], goal[None], state.trajectory)
        state = state._replace(trajectory=trajectory, goal=goal, step_count=jnp.zeros((), jnp.int32))
        return self._reparametrize(state)

    def update_start(self, state: HolonomicState, start: jnp.ndarray) -> HolonomicState:
        """Ref nerf_opt_planner.py:211-218."""
        start = jnp.asarray(start, jnp.float32)
        dist = jnp.sum((state.trajectory - start[None]) ** 2, axis=1)
        min_index = jnp.argmin(dist)
        idx = jnp.arange(state.trajectory.shape[0])
        trajectory = jnp.where((idx < min_index)[:, None], start[None], state.trajectory)
        state = state._replace(trajectory=trajectory, start=start, step_count=jnp.zeros((), jnp.int32))
        return self._reparametrize(state)

    def set_boundaries(self, state, bounds):
        return state._replace(
            bounds=jnp.asarray(bounds, jnp.float32), step_count=jnp.zeros((), jnp.int32)
        )
