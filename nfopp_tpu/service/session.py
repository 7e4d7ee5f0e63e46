"""Device-side scripted replanning session — hardware-true cycle latency.

The host-loop services (`ReplanningService.replan_cycle`,
`FleetReplanningService.replan_cycle`) reproduce the reference's 10 Hz timer
callback (ros/goal_planner_adapter.py:44-63) faithfully, but timing them
through a remote-TPU tunnel measures per-dispatch network noise (random
0.1-0.4 s), not the chip. This module runs K replanning cycles INSIDE one
jitted program — `lax.scan` over cycles, each cycle = the same
update_start(robot pose) + fixed-step optimization burst the service does —
so (total device time) / K is the true per-cycle hardware latency.

Scripted robot model: each cycle the robot advances to waypoint
`follow_index` of its own freshly planned path (exactly what
scripts/replan_latency.py's host loop does between cycles), and every
`cycles_per_goal` cycles it receives a new goal via
`ConstrainedSolver.retarget` (the reference's goal-callback path,
ros/goal_planner_adapter.py:27-37, minus the from-scratch field re-init that
retarget deliberately avoids).

Alignment: update_start/retarget reset step_count to 0, so the per-cycle
`run(steps_per_cycle)` enters chunk-aligned; steps_per_cycle must be a
multiple of reparametrize_trajectory_freq (checked).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = [
    "SessionAux",
    "DynamicSessionAux",
    "advance_along_path",
    "dynamic_replan_session",
    "fleet_dynamic_session",
    "replan_session",
    "fleet_replan_session",
]


class SessionAux(NamedTuple):
    """Per-cycle traces, stacked [goals, cycles_per_goal, ...]."""

    path_length: jnp.ndarray  # xy length of the plan after each cycle
    pose: jnp.ndarray  # robot pose fed to update_start each cycle


def _check_steps(solver, steps_per_cycle: int) -> None:
    freq = solver.config.reparametrize_trajectory_freq
    if steps_per_cycle % freq != 0:
        raise ValueError(
            f"steps_per_cycle ({steps_per_cycle}) must be a multiple of "
            f"reparametrize_trajectory_freq ({freq}) — update_start resets "
            "step_count, so whole chunks keep the static schedule aligned"
        )


def _xy_length(path: jnp.ndarray) -> jnp.ndarray:
    seg = path[1:, :2] - path[:-1, :2]
    return jnp.sum(jnp.sqrt(jnp.sum(seg * seg, axis=-1)))


class DynamicSessionAux(NamedTuple):
    """Per-cycle traces of a dynamic-obstacle session, stacked [cycles, ...]."""

    pose: jnp.ndarray  # executed robot pose after each cycle [C, d]
    reached: jnp.ndarray  # bool: within goal tolerance after this cycle
    path_length: jnp.ndarray  # xy length of the fresh plan
    plan: jnp.ndarray  # the fresh plan itself [C, N+2, d] (for offline checks)


def advance_along_path(path: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Device twin of the demo's robot model (scripts/dynamic_replan_demo.py
    advance_along_path): move `dist` along the plan polyline from its first
    vertex (the robot's own pose — update_start pinned it last cycle), clamped
    at the path end; heading from the entered segment's endpoint."""
    xy = path[:, :2]
    seg = jnp.linalg.norm(xy[1:] - xy[:-1], axis=1)
    cum = jnp.concatenate([jnp.zeros(1, seg.dtype), jnp.cumsum(seg)])
    dist = jnp.minimum(dist, cum[-1])
    j = jnp.clip(jnp.searchsorted(cum, dist, side="right"), 1, len(cum) - 1)
    t = (dist - cum[j - 1]) / jnp.maximum(seg[j - 1], 1e-9)
    t = jnp.clip(t, 0.0, 1.0)
    p = xy[j - 1] + t * (xy[j] - xy[j - 1])
    if path.shape[1] == 3:
        return jnp.asarray([p[0], p[1], path[j, 2]], path.dtype)
    return p


def dynamic_replan_session(
    solver,
    state: Any,
    oracle_builder,
    oracle_xs: Any,
    goal: jnp.ndarray,
    steps_per_cycle: int,
    step_dist: float,
    goal_tolerance: float = 0.2,
) -> tuple[Any, DynamicSessionAux]:
    """Closed-loop dynamic-obstacle session INSIDE one jitted program — the
    device-true version of scripts/dynamic_replan_demo.py's host loop (the
    reference's live-map replanning mode: 10 Hz timer + point-cloud merge,
    ros/goal_planner_adapter.py:44-63 + collision_checker_adapter.py:17-27).

    Per cycle c: the world changes (`oracle_builder(oracle_xs[c])` — e.g.
    fresh sensor points of a moving disc, the scripted analog of the sensor
    topic), the robot advances `step_dist` along its own fresh plan
    (`advance_along_path`, frozen once within `goal_tolerance` of the goal),
    `update_start` re-pins the trajectory, and a `steps_per_cycle`
    optimization burst replans. The ONF field keeps un-learning the
    obstacle's old positions through replay-buffer aging exactly as in the
    host demo. Total device time / cycles = true per-cycle hardware latency;
    the executed pose trace + per-cycle plans come back for offline
    collision/clearance validation against the true moving obstacle.
    """
    _check_steps(solver, steps_per_cycle)
    goal = jnp.asarray(goal, jnp.float32)

    def cycle(carry, xs):
        st, reached = carry
        oracle_t = oracle_builder(xs)
        path = solver.full_trajectory(st)
        advanced = advance_along_path(path, jnp.float32(step_dist))
        pose = jnp.where(reached, path[0], advanced)
        reached = reached | (
            jnp.linalg.norm(pose[:2] - goal[:2]) < goal_tolerance
        )
        st = solver.update_start(st, pose)
        st, _ = solver.run(st, oracle_t, steps_per_cycle)
        plan = solver.full_trajectory(st)
        return (st, reached), DynamicSessionAux(
            pose=pose, reached=reached, path_length=_xy_length(plan), plan=plan
        )

    (state, _), aux = jax.lax.scan(
        cycle, (state, jnp.asarray(False)), oracle_xs
    )
    return state, aux


def fleet_dynamic_session(
    solver,
    states: Any,
    oracle_builder,
    oracle_xs: Any,
    goals: jnp.ndarray,
    steps_per_cycle: int,
    step_dist: float,
    group_size: int,
    goal_tolerance: float = 0.2,
) -> tuple[Any, DynamicSessionAux]:
    """Fleet + DYNAMIC world in one jitted program: R robots (batched
    `states`, per-robot fixed `goals` [R, d]) share one map that CHANGES
    every cycle (`oracle_builder(oracle_xs[c])` -> ONE oracle for the whole
    fleet, e.g. fresh sensor points of moving obstacles). Per cycle every
    robot advances along its own fresh plan (frozen once within
    `goal_tolerance` of its goal), `update_start` re-pins each trajectory,
    and one `run_grouped` burst replans the whole fleet with one shared
    occupancy field per `group_size` robots — the fleet analog of
    `dynamic_replan_session` (the reference's live-map single-robot mode,
    ros/goal_planner_adapter.py:44-63 + collision_checker_adapter.py:17-27,
    scaled out). Aux traces are per-robot ([C, R, ...]) for offline
    validation against the true moving obstacles.
    """
    _check_steps(solver, steps_per_cycle)
    goals = jnp.asarray(goals, jnp.float32)
    robots = goals.shape[0]

    def cycle(carry, xs):
        st, reached = carry
        oracle_t = oracle_builder(xs)
        oracles_b = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (robots,) + x.shape), oracle_t
        )
        paths = jax.vmap(solver.full_trajectory)(st)
        advanced = jax.vmap(advance_along_path, in_axes=(0, None))(
            paths, jnp.float32(step_dist)
        )
        pose = jnp.where(reached[:, None], paths[:, 0], advanced)
        reached = reached | (
            jnp.linalg.norm(pose[:, :2] - goals[:, :2], axis=1)
            < goal_tolerance
        )
        st = jax.vmap(solver.update_start)(st, pose)
        st, _ = solver.run_grouped(st, oracles_b, steps_per_cycle, group_size)
        plans = jax.vmap(solver.full_trajectory)(st)
        return (st, reached), DynamicSessionAux(
            pose=pose, reached=reached,
            path_length=jax.vmap(_xy_length)(plans), plan=plans,
        )

    (state, _), aux = jax.lax.scan(
        cycle, (states, jnp.zeros((robots,), bool)), oracle_xs
    )
    return state, aux


def replan_session(
    solver,
    state: Any,
    oracle_params: Any,
    goals: jnp.ndarray,
    cycles_per_goal: int,
    steps_per_cycle: int,
    follow_index: int = 3,
) -> tuple[Any, SessionAux]:
    """Single-robot session: for each goal in `goals` [G, d], retarget then
    run `cycles_per_goal` replan cycles (pose-track + optimize burst).

    Total cycles = G * cycles_per_goal; call under jit and divide the wall
    time of the whole session by that for per-cycle latency.
    """
    _check_steps(solver, steps_per_cycle)

    def cycle(carry, _):
        st = carry
        path = solver.full_trajectory(st)
        pose = path[follow_index]
        st = solver.update_start(st, pose)
        st, _ = solver.run(st, oracle_params, steps_per_cycle)
        new_path = solver.full_trajectory(st)
        return st, SessionAux(path_length=_xy_length(new_path), pose=pose)

    def per_goal(carry, goal):
        st = solver.retarget(carry, solver.full_trajectory(carry)[follow_index], goal)
        st, aux = jax.lax.scan(cycle, st, None, length=cycles_per_goal)
        return st, aux

    return jax.lax.scan(per_goal, state, jnp.asarray(goals, jnp.float32))


def fleet_replan_session(
    solver,
    states: Any,
    oracle_params: Any,
    goals: jnp.ndarray,
    cycles_per_goal: int,
    steps_per_cycle: int,
    group_size: int,
    follow_index: int = 3,
    subgroups: int = 1,
) -> tuple[Any, SessionAux]:
    """Fleet session: R robots on one shared map (batched `states`,
    `oracle_params` batched per robot, `goals` [G, R, d]); each goal round
    retargets every robot, then runs `cycles_per_goal` batched cycles with one
    shared occupancy field per `group_size` robots (run_grouped — the
    FleetReplanningService stepping mode).

    subgroups=S > 1 splits the fleet into S consecutive sub-batches of R/S
    robots and steps them SEQUENTIALLY inside each cycle (a lax.scan over the
    sub-batch axis): the compiled program is a single (R/S)-robot burst plus
    scan plumbing rather than one R-wide burst, and peak live state per burst
    shrinks S-fold. This is the serving schedule for fleets past the one-shot
    capacity cliff — a 256-robot grouped program reproducibly crashes the
    v5e-lite worker (REPLAN_r04 capacity_boundary), but 2x128 sequential
    bursts are two instances of the proven 128-robot program, and at 20-step
    bursts still fit the reference's 100 ms cycle budget
    (ros/goal_planner_adapter_factory.py:28). Each sub-batch keeps its own
    shared field (groups never span sub-batches), so `group_size` must divide
    R/S; scheduling is the ONLY semantic change vs subgroups=1 with the same
    group_size — sub-batches are independent, so results are bit-identical to
    running S separate (R/S)-robot sessions.
    """
    _check_steps(solver, steps_per_cycle)
    goals = jnp.asarray(goals, jnp.float32)
    if subgroups == 1:

        def cycle(carry, _):
            st = carry
            paths = jax.vmap(solver.full_trajectory)(st)
            poses = paths[:, follow_index]
            st = jax.vmap(solver.update_start)(st, poses)
            st, _ = solver.run_grouped(st, oracle_params, steps_per_cycle, group_size)
            new_paths = jax.vmap(solver.full_trajectory)(st)
            return st, SessionAux(
                path_length=jax.vmap(_xy_length)(new_paths), pose=poses
            )

        def per_goal(carry, goal_row):
            paths = jax.vmap(solver.full_trajectory)(carry)
            st = jax.vmap(solver.retarget)(carry, paths[:, follow_index], goal_row)
            st, aux = jax.lax.scan(cycle, st, None, length=cycles_per_goal)
            return st, aux

        return jax.lax.scan(per_goal, states, goals)

    robots = jax.tree_util.tree_leaves(states)[0].shape[0]
    if robots % subgroups != 0:
        raise ValueError(f"fleet {robots} not divisible by subgroups {subgroups}")
    sub = robots // subgroups
    if sub % group_size != 0:
        raise ValueError(
            f"sub-batch {sub} not divisible by group_size {group_size} — "
            "shared-field groups must not span sequential sub-batches"
        )

    def split(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((subgroups, sub) + x.shape[1:]), tree
        )

    def merge(tree):
        return jax.tree_util.tree_map(
            lambda x: x.reshape((robots,) + x.shape[2:]), tree
        )

    oracles_s = split(oracle_params)

    def sub_cycle(_, sub_in):
        st, opar = sub_in
        paths = jax.vmap(solver.full_trajectory)(st)
        poses = paths[:, follow_index]
        st = jax.vmap(solver.update_start)(st, poses)
        st, _ = solver.run_grouped(st, opar, steps_per_cycle, group_size)
        new_paths = jax.vmap(solver.full_trajectory)(st)
        return None, (st, SessionAux(
            path_length=jax.vmap(_xy_length)(new_paths), pose=poses
        ))

    def cycle(carry, _):
        # one burst program, S sequential instances: subgroup s+1's robots
        # replan after subgroup s within the same wall-clock cycle
        _, (st, aux) = jax.lax.scan(sub_cycle, None, (carry, oracles_s))
        return st, jax.tree_util.tree_map(
            lambda x: x.reshape((robots,) + x.shape[2:]), aux
        )

    def per_goal(carry, goal_row):
        paths = jax.vmap(jax.vmap(solver.full_trajectory))(carry)
        st = jax.vmap(jax.vmap(solver.retarget))(
            carry, paths[:, :, follow_index], split(goal_row)
        )
        st, aux = jax.lax.scan(cycle, st, None, length=cycles_per_goal)
        return st, aux

    final, aux = jax.lax.scan(per_goal, split(states), goals)
    return merge(final), aux
