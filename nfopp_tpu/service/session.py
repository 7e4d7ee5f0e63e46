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

__all__ = ["SessionAux", "replan_session", "fleet_replan_session"]


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
) -> tuple[Any, SessionAux]:
    """Fleet session: R robots on one shared map (batched `states`,
    `oracle_params` batched per robot, `goals` [G, R, d]); each goal round
    retargets every robot, then runs `cycles_per_goal` batched cycles with one
    shared occupancy field per `group_size` robots (run_grouped — the
    FleetReplanningService stepping mode).
    """
    _check_steps(solver, steps_per_cycle)

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

    return jax.lax.scan(per_goal, states, jnp.asarray(goals, jnp.float32))
