"""SE(2) constrained NFOPP solver — the core optimization engine, TPU-native.

Functionally equivalent to the reference's `ConstrainedNERFOptPlanner`
(constrained_nerf_opt_planner.py) + its base `NERFOptPlanner`
(nerf_opt_planner.py), re-designed as a pure function over a `ConstrainedState`
pytree:

  step = [field update: sample -> oracle -> BCE Adam step]            (:76-91)
         [trajectory update: composite loss -> H^-1-preconditioned
          Adam step -> dual ascent on both multiplier vectors]        (:63-118)
         [every `reparametrize_trajectory_freq` steps: arc-length
          reparametrization of trajectory + multipliers]              (:132-171)

All branches are `lax.cond`s, all shapes static; one `jax.lax.scan` runs
thousands of steps without leaving the device, and `jax.vmap` lifts the whole
step over a problem batch (each problem owns field params, multipliers, replay
buffer, and RNG stream). See `nfopp_tpu.parallel` for mesh sharding.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.onf import init_onf_params, onf_apply
from ..ops.hessian import inverse_velocity_hessian
from ..ops.losses import (
    boundary_loss,
    direction_constraint_deltas,
    distance_loss_se2,
    non_holonomic_constraint_deltas,
    softplus_beta,
)
from ..ops.math import wrap_angle
from ..ops.reparametrize import (
    reparametrize_collision_multipliers,
    reparametrize_constraint_multipliers,
    reparametrize_se2,
)
from ..ops.sampling import uniform_box_points
from .config import SolverConfig
from .field import field_loss_and_grad, sample_field_points
from .schedule import scan_chunked

__all__ = ["ConstrainedState", "StepAux", "ConstrainedSolver"]

OracleFn = Callable[[Any, jnp.ndarray], jnp.ndarray]


def _check_chunkable(name: str, num_steps: int, freq: int) -> None:
    """The grouped/batch-explicit run loops have no dynamic fallback: they
    need the static [reparam + freq-1 plain] chunk schedule."""
    if freq <= 1:
        raise ValueError(f"{name} requires reparametrize_trajectory_freq > 1")
    if num_steps % freq != 0:
        raise ValueError(
            f"{name} requires num_steps ({num_steps}) to be a multiple of "
            f"reparametrize_trajectory_freq ({freq})"
        )


class ConstrainedState(NamedTuple):
    """Complete per-problem solver state (a pytree; batch by adding a leading axis)."""

    trajectory: jnp.ndarray  # [N, 3] interior waypoints (x, y, theta)
    field_params: dict  # ONF parameters
    field_opt_state: Any  # optax Adam state for the field
    traj_opt_state: Any  # optax Adam state for the trajectory
    constraint_multipliers: jnp.ndarray  # [N+1] non-holonomic Lagrange multipliers
    collision_multipliers: jnp.ndarray  # [N] collision Lagrange multipliers (>= 0)
    buffer_points: jnp.ndarray  # [K, 3] replay buffer
    buffer_ages: jnp.ndarray  # [K]
    prev_trajectory: jnp.ndarray  # [N, 3] trajectory snapshot for field sampling
    start: jnp.ndarray  # [3]
    goal: jnp.ndarray  # [3]
    bounds: jnp.ndarray  # [4] (xmin, xmax, ymin, ymax)
    key: jax.Array  # PRNG key
    step_count: jnp.ndarray  # scalar int32


class StepAux(NamedTuple):
    """Cheap per-step diagnostics (already computed by the step)."""

    field_loss: jnp.ndarray
    trajectory_loss: jnp.ndarray


class ConstrainedSolver:
    """Static solver object: hyperparameters + oracle + compiled-constant data.

    All methods are pure state->state functions safe under jit/vmap/scan. The
    oracle is a pure callable `(oracle_params, positions[M, 3]) -> bool[M]`
    closed over at construction; its parameters flow through as a pytree
    argument so a batch of problems can carry per-problem worlds.
    """

    # experimental hooks (see nfopp_tpu.experimental): trace-time overrides
    # for the TPU-falsified structural variants; always None/off here
    _collision_terms = None

    def __init__(self, config: SolverConfig, oracle_fn: OracleFn):
        self.config = config
        self.oracle_fn = oracle_fn
        n = config.trajectory_length
        # Dense inverse of the smoothness Hessian, precomputed host-side once
        # (ref nerf_opt_planner.py:45-58) and closed over as a compile-time
        # constant; applied as one [N, N] @ [N, 3] MXU matmul per step (:151).
        self._inv_hessian = jnp.asarray(
            inverse_velocity_hessian(n, config.velocity_hessian_weight)
        )
        b1, b2 = config.collision_betas
        self._field_opt = optax.adam(config.collision_lr, b1=b1, b2=b2, eps=config.adam_eps)
        b1, b2 = config.trajectory_betas
        self._traj_opt = optax.adam(config.trajectory_lr, b1=b1, b2=b2, eps=config.adam_eps)

    # ------------------------------------------------------------------ init

    def initial_trajectory(self, start: jnp.ndarray, goal: jnp.ndarray) -> jnp.ndarray:
        """Straight-line xy + wrapped-delta angle interpolation
        (trajectory_initializer.py:12-29), optionally blended toward the path
        direction (:31-43)."""
        cfg = self.config
        m = cfg.trajectory_length + 2
        x = jnp.linspace(start[0], goal[0], m)[1:-1]
        y = jnp.linspace(start[1], goal[1], m)[1:-1]
        goal_angle = start[2] + wrap_angle(goal[2] - start[2])
        theta = jnp.linspace(start[2], goal_angle, m)[1:-1]
        trajectory = jnp.stack([x, y, theta], axis=1)
        if cfg.init_angles_with_trajectory:
            trajectory = self._blend_angles_with_direction(trajectory, start, goal)
        return trajectory.astype(jnp.float32)

    def _blend_angles_with_direction(self, trajectory, start, goal):
        """Central-difference heading blended by a triangular weight ramp
        (trajectory_initializer.py:31-43)."""
        n = trajectory.shape[0]
        full = jnp.concatenate([start[None], trajectory, goal[None]], axis=0)
        dx = full[2:, 0] - full[:-2, 0]
        dy = full[2:, 1] - full[:-2, 1]
        headings = jnp.arctan2(dy, dx)
        weights = jnp.concatenate(
            [jnp.linspace(0.0, 1.0, n // 2), jnp.linspace(1.0, 0.0, (n + 1) // 2)]
        )
        delta = wrap_angle(headings - trajectory[:, 2]) * weights
        return trajectory.at[:, 2].add(delta)

    def init_state(
        self,
        key: jax.Array,
        start: jnp.ndarray,
        goal: jnp.ndarray,
        bounds: jnp.ndarray,
        oracle_params: Any,
        trajectory: jnp.ndarray | None = None,
        field_key: jax.Array | None = None,
    ) -> ConstrainedState:
        """Build a fresh solver state for one problem (ref init,
        nerf_opt_planner.py:181-187 + constrained _init_trajectory).

        `trajectory` overrides the straight-line initializer (used by the A*
        initializer, which runs host-side once per problem).

        `field_key` overrides the key used for field init + pretraining:
        problems given the SAME field_key (and the same world/bounds) start
        with IDENTICAL fields — the shared-field group mode (`run_grouped`)
        relies on this to keep a map group's field replicas in lockstep.

        Deviation from the reference: the replay buffer is pre-filled with
        uniform random field points (the reference starts empty and grows,
        :101-111, which is not expressible with static shapes). The buffer
        content fully turns over within the first couple of steps either way.
        """
        cfg = self.config
        start = jnp.asarray(start, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        bounds = jnp.asarray(bounds, jnp.float32)
        key, k_field, k_buffer, k_pretrain = jax.random.split(key, 4)
        if field_key is not None:
            k_field, k_pretrain = jax.random.split(field_key)
        if trajectory is None:
            trajectory = self.initial_trajectory(start, goal)
        trajectory = jnp.asarray(trajectory, jnp.float32)
        field_params = init_onf_params(k_field, cfg.onf)
        buffer_points = uniform_box_points(
            k_buffer, cfg.collision_point_count, bounds, with_angle=True
        )
        n = cfg.trajectory_length
        state = ConstrainedState(
            trajectory=trajectory,
            field_params=field_params,
            field_opt_state=self._field_opt.init(field_params),
            traj_opt_state=self._traj_opt.init(trajectory),
            constraint_multipliers=jnp.zeros(n + 1, jnp.float32),
            collision_multipliers=jnp.zeros(n, jnp.float32),
            buffer_points=buffer_points,
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

    def _pretrain_field(
        self, state: ConstrainedState, oracle_params: Any, key: jax.Array
    ) -> ConstrainedState:
        """Field pretraining on uniform random points (ref _init_collision_model,
        nerf_opt_planner.py:197-200)."""
        cfg = self.config

        def body(i, carry):
            params, opt_state, key = carry
            key, k_pts = jax.random.split(key)
            points = uniform_box_points(k_pts, cfg.init_collision_points, state.bounds, True)
            truth = self.oracle_fn(oracle_params, points)
            _, grads = field_loss_and_grad(cfg, params, points, truth)
            updates, opt_state = self._field_opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, key

        params, opt_state, _ = jax.lax.fori_loop(
            0,
            cfg.init_collision_iteration,
            body,
            (state.field_params, state.field_opt_state, key),
        )
        return state._replace(field_params=params, field_opt_state=opt_state)

    # ------------------------------------------------------------------ step

    def full_trajectory(self, state: ConstrainedState) -> jnp.ndarray:
        """[N+2, 3] trajectory with pinned endpoints (ref full_trajectory :73-74)."""
        return jnp.concatenate([state.start[None], state.trajectory, state.goal[None]], axis=0)

    def step(
        self, state: ConstrainedState, oracle_params: Any
    ) -> tuple[ConstrainedState, StepAux]:
        """One alternating optimization step (ref step(), nerf_opt_planner.py:60-71).

        Schedule conds are dynamic here (single-step API parity); `run` uses a
        statically-scheduled variant — under vmap `lax.cond` lowers to select
        and EXECUTES both branches, so dynamic gating saves nothing in batched
        mode. Callers vmapping single steps should use `step_static` and take
        the reparametrization decision at trace time instead.
        """
        cfg = self.config
        key, k_field, k_traj = jax.random.split(state.key, 3)
        state = state._replace(key=key)

        state, field_loss, traj_loss = self._field_and_trajectory(
            state, oracle_params, k_field, k_traj
        )

        do_reparam = state.step_count % cfg.reparametrize_trajectory_freq == 0
        state = jax.lax.cond(do_reparam, self._reparametrize, lambda s: s, state)

        state = state._replace(step_count=state.step_count + 1)
        return state, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def _field_and_trajectory(
        self, state: ConstrainedState, oracle_params: Any,
        k_field: jax.Array, k_traj: jax.Array,
        with_field: bool | None = None,
    ) -> tuple[ConstrainedState, jnp.ndarray, jnp.ndarray]:
        """Field update + trajectory update, in the configured order.

        with_field: None = config-driven (reference-exact dynamic
        `optimize_collision_model_freq` cond, nerf_opt_planner.py:62-63 —
        executes BOTH branches under vmap); True/False = the caller took the
        decision statically (run's chunked schedule lowers the freq to a
        static stride when it divides reparametrize_trajectory_freq).

        Gauss-Seidel order (the reference's, nerf_opt_planner.py:60-71): the
        trajectory loss reads the field params updated THIS step, so the two
        sub-updates form one serial dependency chain inside the scan body.
        (The Jacobi/merged reorderings that cut this chain live in
        nfopp_tpu.experimental — both TPU-measured slower,
        BASELINE_MEASURED.md.)
        """
        cfg = self.config
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
        return state, field_loss, traj_loss

    def step_static(
        self, state: ConstrainedState, oracle_params: Any, with_reparam: bool,
        with_field: bool | None = None,
    ) -> tuple[ConstrainedState, StepAux]:
        """Step with the reparametrization decision taken at trace time.

        The vmap-safe single-step API: `step`'s dynamic `lax.cond` executes
        BOTH branches under vmap (reparametrization every step, silently ~2x
        cost); here the caller schedules reparametrization statically, as
        `run`'s chunked scan does (reference freq semantics:
        nerf_opt_planner.py:60-71 — reparametrize when step_count % freq == 0).
        with_field statically schedules optimize_collision_model_freq the same
        way (None keeps the dynamic cond). Three keys are split per step
        regardless, so the trajectory RNG stream is schedule-independent.
        """
        key, k_field, k_traj = jax.random.split(state.key, 3)
        state = state._replace(key=key)
        state, field_loss, traj_loss = self._field_and_trajectory(
            state, oracle_params, k_field, k_traj, with_field
        )
        if with_reparam:
            state = self._reparametrize(state)
        state = state._replace(step_count=state.step_count + 1)
        return state, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def _field_grads(
        self, state: ConstrainedState, oracle_params: Any, key: jax.Array
    ):
        """Sample -> oracle -> BCE loss + param grads (no optimizer update)."""
        cfg = self.config
        sample = sample_field_points(
            cfg,
            key,
            state.prev_trajectory,
            state.buffer_points,
            state.buffer_ages,
            state.field_params,
            state.bounds,
        )
        truth = self.oracle_fn(oracle_params, sample.train_points)
        loss, grads = field_loss_and_grad(cfg, state.field_params, sample.train_points, truth)
        return sample, loss, grads

    def _apply_field_update(self, state, sample, grads):
        updates, opt_state = self._field_opt.update(grads, state.field_opt_state, state.field_params)
        params = optax.apply_updates(state.field_params, updates)
        return state._replace(
            field_params=params,
            field_opt_state=opt_state,
            buffer_points=sample.buffer_points,
            buffer_ages=sample.buffer_ages,
            prev_trajectory=state.trajectory,
        )

    def _field_step(
        self, state: ConstrainedState, oracle_params: Any, key: jax.Array
    ) -> tuple[ConstrainedState, jnp.ndarray]:
        sample, loss, grads = self._field_grads(state, oracle_params, key)
        return self._apply_field_update(state, sample, grads), loss

    # ------------------------------------------------------- trajectory loss

    def trajectory_loss(
        self,
        trajectory: jnp.ndarray,
        constraint_multipliers: jnp.ndarray,
        collision_multipliers: jnp.ndarray,
        field_params: dict,
        start: jnp.ndarray,
        goal: jnp.ndarray,
        bounds: jnp.ndarray,
        t: jnp.ndarray,
    ) -> jnp.ndarray:
        """Composite SE(2) objective (ref trajectory_loss,
        constrained_nerf_opt_planner.py:76-100). `t` [N-1, S] holds S uniform
        samples per segment drawn outside so value and grads share them
        (S = config.collision_samples_per_segment; S=1 = reference)."""
        cfg = self.config
        full = jnp.concatenate([start[None], trajectory, goal[None]], axis=0)

        # Segment-interpolated collision samples with wrapped-angle lerp (:78-81);
        # gradients flow into the trajectory through the sample positions.
        # t has shape [N-1, S] for S samples per segment (S=1 is the exact
        # reference behavior); the collision terms are averaged over S so the
        # loss scale matches the reference at any S.
        delta = trajectory[:-1] - trajectory[1:]
        delta = delta.at[:, 2].set(wrap_angle(delta[:, 2]))
        samples = t.shape[1]
        collision_positions = (
            trajectory[1:, None, :] + t[:, :, None] * delta[:, None, :]
        ).reshape(-1, 3)
        multipliers = (
            collision_multipliers[1:, None] * (1.0 - t) + collision_multipliers[:-1, None] * t
        ).reshape(-1)

        if self._collision_terms is not None:
            # experimental hook (fused Pallas collision terms; class attribute
            # set only by experimental.ExperimentalConstrainedSolver — trace-
            # time dispatch, no compiled branch)
            collision_loss, multiplier_loss = self._collision_terms(
                field_params, collision_positions, multipliers
            )
        else:
            logits = onf_apply(field_params, collision_positions, cfg.onf)
            collision_loss = jnp.sum(softplus_beta(logits, cfg.collision_beta))
            multiplier_loss = jnp.sum(multipliers * jnp.tanh(logits[:, 0]))
        collision_loss = collision_loss / samples
        multiplier_loss = multiplier_loss / samples

        constraint_deltas = non_holonomic_constraint_deltas(full)
        direction_deltas = jnp.maximum(direction_constraint_deltas(full), 0.0)

        return (
            distance_loss_se2(full, cfg.angle_weight)
            + collision_loss * cfg.collision_weight
            + jnp.sum(constraint_multipliers * constraint_deltas)
            + jnp.sum(constraint_deltas**2) * cfg.constraint_deltas_weight
            + boundary_loss(trajectory, bounds) * cfg.boundary_weight
            + multiplier_loss
            + cfg.direction_delta_weight * jnp.sum(direction_deltas**2)
        )

    def _trajectory_step(
        self, state: ConstrainedState, key: jax.Array
    ) -> tuple[ConstrainedState, jnp.ndarray]:
        """Primal step (H^-1-preconditioned Adam, ref :143-155) + dual ascent on
        both multiplier vectors (ref :63-74 — note *ascent*: += lr * grad, with
        collision multipliers projected onto >= 0)."""
        cfg = self.config
        n = cfg.trajectory_length
        t = jax.random.uniform(
            key, (n - 1, cfg.collision_samples_per_segment), jnp.float32
        )

        loss, (traj_grad, cons_grad, coll_grad) = jax.value_and_grad(
            self.trajectory_loss, argnums=(0, 1, 2)
        )(
            state.trajectory,
            state.constraint_multipliers,
            state.collision_multipliers,
            state.field_params,
            state.start,
            state.goal,
            state.bounds,
            t,
        )

        traj_grad = self._inv_hessian @ traj_grad
        updates, opt_state = self._traj_opt.update(traj_grad, state.traj_opt_state, state.trajectory)
        trajectory = optax.apply_updates(state.trajectory, updates)

        constraint_multipliers = state.constraint_multipliers + cfg.multipliers_lr * cons_grad
        collision_multipliers = jnp.maximum(
            state.collision_multipliers + cfg.collision_multipliers_lr * coll_grad, 0.0
        )
        return (
            state._replace(
                trajectory=trajectory,
                traj_opt_state=opt_state,
                constraint_multipliers=constraint_multipliers,
                collision_multipliers=collision_multipliers,
            ),
            loss,
        )

    # -------------------------------------------------------- reparametrize

    def _reparametrize(self, state: ConstrainedState) -> ConstrainedState:
        """Arc-length reparametrization of trajectory + both multiplier vectors
        (ref constrained :132-171), applied outside the gradient tape."""
        full = self.full_trajectory(state)
        trajectory, interp = reparametrize_se2(full)
        return state._replace(
            trajectory=trajectory,
            collision_multipliers=reparametrize_collision_multipliers(
                state.collision_multipliers, interp
            ),
            constraint_multipliers=reparametrize_constraint_multipliers(
                state.constraint_multipliers, interp
            ),
        )

    # ------------------------------------------------------------- run loop

    def _static_field_stride(self) -> int:
        """optimize_collision_model_freq lowered to a static chunk stride when
        it divides reparametrize_trajectory_freq; 1 otherwise (the dynamic
        in-step cond is kept, which under vmap executes both branches)."""
        s = self.config.optimize_collision_model_freq
        freq = self.config.reparametrize_trajectory_freq
        return s if s > 1 and freq % s == 0 else 1

    def run(
        self, state: ConstrainedState, oracle_params: Any, num_steps: int,
        allow_static: bool = True,
    ) -> tuple[ConstrainedState, StepAux]:
        """Scan `num_steps` steps on device; aux is stacked per step.

        When num_steps is a multiple of reparametrize_trajectory_freq the
        schedule is compiled statically: each chunk is [1 step + reparam,
        freq-1 plain steps] (reparametrization fires at step_count % freq == 0,
        i.e. at the END of the first step — counts 0, freq, 2*freq, ... exactly
        as the reference's dynamic check). This avoids vmap's execute-both-
        branches select on the reparametrization, which otherwise runs the
        searchsorted/gather resample EVERY step in batched mode.

        The static path REQUIRES state.step_count % freq == 0 on entry (true
        after init / update_* which reset it, and preserved across run calls
        with multiple-of-freq lengths). step_count is traced, so this cannot
        be checked here — callers that may enter misaligned (e.g. a stateful
        shell mixing run lengths) must pass allow_static=False to force the
        reference-exact dynamic schedule; NFOPPlanner.step does this
        automatically from its host-side step counter.

        optimize_collision_model_freq > 1 is ALSO lowered to a static schedule
        here when it divides the reparametrization freq (field trains at chunk
        positions 0, s, 2s, ...; the dynamic check `step_count % s == 0` fires
        at exactly those positions given the entry alignment above). Under
        vmap the dynamic cond executes the field update every step and throws
        the result away on skipped steps — the static schedule actually skips
        it, which is the whole point of training the field less often.
        """
        freq = self.config.reparametrize_trajectory_freq

        def dyn_body(carry, _):
            new_state, aux = self.step(carry, oracle_params)
            return new_state, aux

        if freq <= 1 or num_steps % freq != 0 or not allow_static:
            return jax.lax.scan(dyn_body, state, None, length=num_steps)

        stride = self._static_field_stride()
        if stride > 1:
            step_fn = lambda s, r, f: self.step_static(
                s, oracle_params, with_reparam=r, with_field=f)
        else:  # non-dividing freq keeps the dynamic in-step cond (None)
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

    # ------------------------------------------ shared-field group mode

    def _field_step_grouped(self, states, oracle_params, keys, group_size: int):
        """Field update with gradients averaged within each map group.

        SURVEY.md §2 designs three communication jobs for the batch mesh; this
        is job (3): optional shared-field updates between solves on the same
        map. Each group of `group_size` consecutive problems keeps an
        identical field replica (see init_state's field_key); every problem
        still samples its own training points, so the group's field
        effectively trains on group_size x points per step. The group mean is
        a plain reshape-mean — when the batch axis is sharded over a mesh and
        a group spans shards, XLA lowers it to the psum collective.
        """
        samples, losses, grads = self._field_grads_grouped(
            states, oracle_params, keys, group_size
        )
        states = jax.vmap(self._apply_field_update)(states, samples, grads)
        return states, losses

    def _field_grads_grouped(self, states, oracle_params, keys, group_size: int):
        """Per-problem field grads, group-mean'd (no optimizer update)."""
        samples, losses, grads = jax.vmap(self._field_grads)(
            states, oracle_params, keys
        )
        grads = jax.tree_util.tree_map(
            lambda g: self._group_mean(g, group_size), grads
        )
        return samples, losses, grads

    @staticmethod
    def _group_mean(g: jnp.ndarray, group_size: int) -> jnp.ndarray:
        """Mean over each group of `group_size` consecutive batch rows,
        broadcast back to the full batch shape."""
        b = g.shape[0]
        grouped = g.reshape((b // group_size, group_size) + g.shape[1:])
        mean = jnp.mean(grouped, axis=1, keepdims=True)
        return jnp.broadcast_to(mean, grouped.shape).reshape(g.shape)

    def _step_grouped(self, states, oracle_params, with_reparam: bool,
                      group_size: int, with_field: bool = True):
        cfg = self.config
        if cfg.optimize_collision_model_freq != 1 and self._static_field_stride() == 1:
            raise NotImplementedError(
                "shared-field mode requires optimize_collision_model_freq == 1 "
                "or one that divides reparametrize_trajectory_freq"
            )
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
        states = states._replace(key=keys[:, 0])
        if not with_field:
            field_loss = jnp.zeros((states.trajectory.shape[0],), jnp.float32)
            states, traj_loss = jax.vmap(self._trajectory_step)(states, keys[:, 2])
        else:
            states, field_loss = self._field_step_grouped(
                states, oracle_params, keys[:, 1], group_size
            )
            states, traj_loss = jax.vmap(self._trajectory_step)(states, keys[:, 2])
        if with_reparam:
            states = jax.vmap(self._reparametrize)(states)
        states = states._replace(step_count=states.step_count + 1)
        return states, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def run_grouped(self, states, oracle_params, num_steps: int,
                    group_size: int):
        """Batch-level `run` with one shared occupancy field per group of
        `group_size` consecutive problems (same map, e.g. portfolio restarts
        or multi-query planning). Init the batch with per-group field_keys so
        replicas start identical; the group-averaged gradients keep them in
        lockstep. Same per-problem RNG stream as the vmapped `run`
        (group_size=1 reproduces it exactly).

        Like `run`'s static path, the schedule REQUIRES step_count % freq == 0
        on entry (true after init_state / update_*; preserved across calls
        with multiple-of-freq lengths). There is no allow_static escape here —
        entering misaligned silently trains the field and reparametrizes at
        the wrong steps (see run()'s docstring for the dynamic fallback).
        """
        freq = self.config.reparametrize_trajectory_freq
        _check_chunkable("run_grouped", num_steps, freq)
        if states.trajectory.shape[0] % group_size != 0:
            raise ValueError(
                f"batch {states.trajectory.shape[0]} not divisible by "
                f"group_size {group_size}"
            )
        states, aux = scan_chunked(
            lambda s, r, f: self._step_grouped(s, oracle_params, r, group_size,
                                               with_field=f),
            states, num_steps, freq,
            self.config.scan_unroll, self.config.outer_scan_unroll,
            field_stride=self._static_field_stride(),
        )
        # [chunks, freq, B] -> [B, steps] to match vmap(run)'s layout
        aux = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x.reshape((num_steps,) + x.shape[2:]), 0, 1), aux
        )
        return states, aux

    # ------------------------------------------------- live problem updates

    def update_goal(self, state: ConstrainedState, goal: jnp.ndarray) -> ConstrainedState:
        """Move the goal: clamp the trajectory tail past the closest waypoint to
        the new goal, reparametrize, reset the schedule (ref :178-185)."""
        goal = jnp.asarray(goal, jnp.float32)
        dist = jnp.sum((state.trajectory[:, :2] - goal[None, :2]) ** 2, axis=1)
        min_index = jnp.minimum(jnp.argmin(dist) + 1, state.trajectory.shape[0])
        idx = jnp.arange(state.trajectory.shape[0])
        trajectory = jnp.where((idx >= min_index)[:, None], goal[None], state.trajectory)
        state = state._replace(
            trajectory=trajectory, goal=goal, step_count=jnp.zeros((), jnp.int32)
        )
        return self._reparametrize(state)

    def update_start(self, state: ConstrainedState, start: jnp.ndarray) -> ConstrainedState:
        """Move the start (robot pose tracking in anytime mode, ref :187-194)."""
        start = jnp.asarray(start, jnp.float32)
        dist = jnp.sum((state.trajectory[:, :2] - start[None, :2]) ** 2, axis=1)
        min_index = jnp.minimum(jnp.argmin(dist) + 1, state.trajectory.shape[0])
        idx = jnp.arange(state.trajectory.shape[0])
        trajectory = jnp.where((idx < min_index)[:, None], start[None], state.trajectory)
        state = state._replace(
            trajectory=trajectory, start=start, step_count=jnp.zeros((), jnp.int32)
        )
        return self._reparametrize(state)

    def set_boundaries(self, state: ConstrainedState, bounds: jnp.ndarray) -> ConstrainedState:
        return state._replace(
            bounds=jnp.asarray(bounds, jnp.float32), step_count=jnp.zeros((), jnp.int32)
        )

    def retarget(
        self,
        state: ConstrainedState,
        start: jnp.ndarray,
        goal: jnp.ndarray,
        trajectory: jnp.ndarray | None = None,
    ) -> ConstrainedState:
        """New (start, goal) query on the SAME map: rebuild the trajectory,
        multipliers, and trajectory-optimizer state; KEEP the learned field,
        its optimizer state, and the replay buffer — the field models the
        map, not the query.

        The reference's goal callback re-inits the whole planner and
        re-pretrains the field from scratch (ros/goal_planner_adapter.py:27-37
        -> nerf_opt_planner.py:181-200); keeping the map knowledge is what its
        persistent-planner anytime mode does implicitly for small goal moves
        (constrained :178-185). retarget makes it an explicit primitive — the
        fleet/multi-query services use it for arbitrary goal changes without
        relearning the world. Keeps the field replicas of a shared-field group
        in lockstep (no field state is touched)."""
        start = jnp.asarray(start, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        if trajectory is None:
            trajectory = self.initial_trajectory(start, goal)
        trajectory = jnp.asarray(trajectory, jnp.float32)
        n = self.config.trajectory_length
        return state._replace(
            trajectory=trajectory,
            traj_opt_state=self._traj_opt.init(trajectory),
            constraint_multipliers=jnp.zeros(n + 1, jnp.float32),
            collision_multipliers=jnp.zeros(n, jnp.float32),
            prev_trajectory=trajectory,
            start=start,
            goal=goal,
            step_count=jnp.zeros((), jnp.int32),
        )
