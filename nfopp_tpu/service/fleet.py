"""Fleet replanning: batched anytime planning for N robots on ONE shared map.

The reference's ROS node serves one robot with one persistent planner
(ros/goal_planner_adapter.py); this service is the batched TPU analog — the
whole fleet is one sharded problem batch stepped together inside the time
budget, and (optionally) every robot's samples train ONE occupancy field
(`shared_field=True`, run_grouped): the map model is common, the queries are
not. Goal changes use `ConstrainedSolver.retarget`, which rebuilds the
query-specific state while keeping the learned field, so a new goal never
pays for relearning the world and never breaks the shared-field lockstep.

Middleware-neutral like `ReplanningService`: a ROS/gRPC node is a thin
adapter calling update_robot_pose / set_goal / replan_cycle.
"""
from __future__ import annotations

import threading
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.batch import BatchPlanner
from ..parallel.mesh import problem_mesh
from .postprocessor import PathPostprocessor

__all__ = ["FleetReplanningService"]


def _write_lane(states: Any, lane_state: Any, i) -> Any:
    return jax.tree_util.tree_map(
        lambda full, one: full.at[i].set(one), states, lane_state
    )


class FleetReplanningService:
    def __init__(
        self,
        solver,
        n_robots: int,
        bounds: np.ndarray,
        oracle_params: Any,
        mesh=None,
        planning_timeout: float = 0.1,
        steps_per_chunk: int | None = None,
        shared_field: bool = True,
        group_size: int | None = None,
        postprocessor: PathPostprocessor | None = None,
        seed: int = 0,
    ):
        """group_size (shared-field mode only) sets the field-sharing
        granularity: one occupancy field per `group_size` consecutive robots
        (default: the whole fleet). Large fleets serve fine with sub-fleet
        fields — REPLAN_r05 measured a 256-robot fleet at two 128-robot
        field groups inside the 10 Hz budget — and a robot's retarget stays
        within its group's lockstep either way."""
        self.solver = solver
        self.n_robots = n_robots
        self.planning_timeout = planning_timeout
        if group_size is None:
            group_size = n_robots
        if shared_field and n_robots % group_size != 0:
            raise ValueError(
                f"n_robots {n_robots} not divisible by group_size {group_size}"
            )
        self.group_size = group_size
        freq = solver.config.reparametrize_trajectory_freq
        # grouped stepping needs whole reparametrization chunks
        self.steps_per_chunk = steps_per_chunk if steps_per_chunk is not None else freq
        if shared_field and self.steps_per_chunk % freq != 0:
            raise ValueError(
                f"steps_per_chunk ({self.steps_per_chunk}) must be a multiple "
                f"of reparametrize_trajectory_freq ({freq}) in shared-field mode"
            )
        self.shared_field = shared_field
        self.postprocessor = postprocessor
        self._mutex = threading.Lock()
        if mesh is None:
            # the fleet is the batch: use the most devices that divide it
            devices = jax.devices()
            n = len(devices)
            while n_robots % n != 0:
                n -= 1
            mesh = problem_mesh(devices[:n])
        self._planner = BatchPlanner(solver, mesh)
        self._bounds = jnp.asarray(bounds, jnp.float32)
        self._active = np.zeros(n_robots, dtype=bool)
        self._poses = np.zeros((n_robots, 3), np.float32)
        self._has_pose = np.zeros(n_robots, dtype=bool)
        self._key = jax.random.PRNGKey(seed)
        self._states = None
        self._oracles = None
        self.update_world(oracle_params)

        self._jit_retarget = jax.jit(
            lambda states, i, start, goal: _write_lane(
                states,
                solver.retarget(
                    jax.tree_util.tree_map(lambda x: x[i], states), start, goal
                ),
                i,
            )
        )
        self._jit_update_starts = jax.jit(
            lambda states, poses, mask: jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                ),
                jax.vmap(solver.update_start)(states, poses),
                states,
            )
        )

    # ------------------------------------------------------------- inputs

    def update_world(self, oracle_params: Any, group: int | None = None) -> None:
        """New map/sensor oracle for the whole fleet, or — with `group` —
        for one field group's robots only (multi-tenant serving: one chip
        serves sub-fleets on DIFFERENT maps, one shared field per map;
        `init_batch_grouped` enforces world uniformity per group, not
        globally). Call before the first set_goal when maps differ, so field
        pretraining sees each group's own map."""
        with self._mutex:
            if group is None:
                self._oracles = jax.tree_util.tree_map(
                    lambda x: jnp.tile(
                        jnp.asarray(x)[None],
                        (self.n_robots,) + (1,) * jnp.ndim(x),
                    ),
                    oracle_params,
                )
                return
            if self._oracles is None:
                raise ValueError(
                    "set the fleet-wide world before per-group updates "
                    "(update_world(params) defines the oracle structure)"
                )
            lo = group * self.group_size
            hi = lo + self.group_size
            if not 0 <= lo < hi <= self.n_robots:
                raise ValueError(f"group {group} out of range")
            self._oracles = jax.tree_util.tree_map(
                lambda full, x: full.at[lo:hi].set(
                    jnp.tile(
                        jnp.asarray(x)[None],
                        (self.group_size,) + (1,) * jnp.ndim(x),
                    )
                ),
                self._oracles,
                oracle_params,
            )

    def update_robot_pose(self, robot: int, pose: np.ndarray) -> None:
        with self._mutex:
            self._poses[robot] = np.asarray(pose, np.float32)
            self._has_pose[robot] = True

    def set_goal(self, robot: int, goal: np.ndarray) -> bool:
        """(Re)target one robot. The first call initializes the whole batch
        (all lanes share the same field pretraining schedule); later calls
        retarget only that robot's lane, keeping all field state."""
        with self._mutex:
            if not self._has_pose[robot]:
                return False
            goal = jnp.asarray(goal, jnp.float32)
            start = jnp.asarray(self._poses[robot], jnp.float32)
            if self._states is None:
                self._init_states()
            self._states = self._jit_retarget(self._states, robot, start, goal)
            self._active[robot] = True
            return True

    def stop(self, robot: int) -> None:
        with self._mutex:
            self._active[robot] = False

    def _init_states(self) -> None:
        """First-goal batch init: every lane starts at its pose (goal=pose,
        a trivial query) so inactive lanes optimize no-ops while active
        lanes get retargeted."""
        poses = jnp.asarray(self._poses, jnp.float32)
        bounds = jnp.tile(self._bounds[None], (self.n_robots, 1))
        if self.shared_field:
            self._states = self._planner.init_batch_grouped(
                self._key, poses, poses, bounds, self._oracles,
                group_size=self.group_size,
            )
        else:
            self._states = self._planner.init_batch(
                self._key, poses, poses, bounds, self._oracles
            )

    # -------------------------------------------------------------- cycle

    def replan_cycle(self) -> dict[int, np.ndarray]:
        """One fleet cycle: track every robot's pose, optimize the whole
        batch within the time budget, return {robot: path} for active robots."""
        with self._mutex:
            if self._states is None or not self._active.any():
                return {}
            mask = jnp.asarray(self._active & self._has_pose)
            poses = jnp.asarray(self._poses, jnp.float32)
            self._states = self._jit_update_starts(self._states, poses, mask)
            deadline = time.perf_counter() + self.planning_timeout
            while True:
                if self.shared_field:
                    self._states, aux = self._planner.run_grouped(
                        self._states, self._oracles, self.steps_per_chunk,
                        self.group_size,
                    )
                else:
                    self._states, aux = self._planner.run(
                        self._states, self._oracles, self.steps_per_chunk
                    )
                # force completion before re-checking the clock (async dispatch)
                float(jnp.sum(aux.trajectory_loss[:, -1]))
                if time.perf_counter() >= deadline:
                    break
            paths = np.asarray(self._planner.paths(self._states))
            active = [int(i) for i in np.nonzero(self._active)[0]]
        out = {}
        for i in active:
            path = paths[i]
            if self.postprocessor is not None:
                path = self.postprocessor.process(path)
            out[i] = path
        return out
