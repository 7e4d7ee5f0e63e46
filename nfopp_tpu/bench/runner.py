"""Benchmark suite runner: batched TPU solves over scenario suites.

The reference runs one scenario per subprocess (bench-mr's MPB driver spawning
scripts/run_bench_mr.py, SURVEY.md §3.3) and pools 10 seeds in notebooks. Here
a whole suite (all seeds × scenarios of one world type) is ONE sharded batch:
generate worlds host-side, solve simultaneously on the mesh with best-path
tracking/early stop, then evaluate PathStatistics per problem (native C++
evaluator) and save reference-schema results JSON.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import BatchPlanner, problem_mesh
from ..solver import ConstrainedSolver, config_from_parameters
from ..solver.api import DEFAULT_PARAMETERS
from ..worlds.oracle import grid_collision
from ..worlds.scenarios import GridScenario
from .metrics import path_statistics
from .results import ResultsLog, grid_environment_info

__all__ = ["SuiteResult", "run_grid_suite"]


@dataclass
class SuiteResult:
    paths: np.ndarray  # [B, N+2, 3]
    feasible: np.ndarray  # [B] bool
    lengths: np.ndarray  # [B]
    iterations: np.ndarray  # [B]
    stats: list  # [B] PathStatistics
    wall_time: float
    log: ResultsLog
    # start/goal-in-collision prechecks (the reference exits 3/4 on these,
    # run_bench_mr.py:94-98; batched mode flags per problem instead)
    start_invalid: np.ndarray | None = None  # [B] bool
    goal_invalid: np.ndarray | None = None  # [B] bool


def run_grid_suite(
    scenarios: list[GridScenario],
    parameters: Mapping | None = None,
    footprint_radius: float = 0.0,
    max_iterations: int = 1000,
    min_iterations: int = 200,
    check_freq: int = 50,
    seed: int = 0,
    planner_name: str = "constrained_onf_planner",
    mesh=None,
    astar_init: bool = True,
) -> SuiteResult:
    """Solve every scenario in one batch; scenarios must share grid shape.

    astar_init=True seeds each problem with a batched wavefront geodesic path
    (the benchmark-mode AstarTrajectoryInitializer role, run_bench_mr.py:23-27),
    computed on device against the footprint-dilated grid.
    """
    if parameters is None:
        parameters = DEFAULT_PARAMETERS
    config = config_from_parameters(parameters)
    solver = ConstrainedSolver(config, grid_collision)
    planner = BatchPlanner(solver, mesh if mesh is not None else problem_mesh())

    oracles_list = [s.oracle(footprint_radius) for s in scenarios]
    oracles = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *oracles_list)
    starts = jnp.asarray(np.stack([s.start for s in scenarios]))
    goals = jnp.asarray(np.stack([s.goal for s in scenarios]))
    bounds = jnp.asarray(
        np.stack([np.asarray(s.bounds, np.float32) for s in scenarios])
    )

    # start/goal validity precheck against the footprint-dilated oracles
    endpoint_check = jax.jit(
        jax.vmap(lambda o, s, g: grid_collision(o, jnp.stack([s, g])))
    )(oracles, starts, goals)
    endpoint_check = np.asarray(endpoint_check)
    start_invalid, goal_invalid = endpoint_check[:, 0], endpoint_check[:, 1]

    t0 = time.time()
    trajectories = None
    if astar_init:
        from ..astar.initializer import batched_wavefront_trajectories

        grids = oracles.occupancy  # footprint-dilated occupancy [B, H, W]
        origins = jnp.asarray(
            np.stack([np.asarray(s.origin, np.float32) for s in scenarios])
        )
        resolutions = jnp.asarray(
            np.asarray([s.resolution for s in scenarios], np.float32)
        )
        trajectories = jax.jit(
            batched_wavefront_trajectories, static_argnums=5
        )(grids, starts, goals, origins, resolutions, config.trajectory_length)
    states = planner.init_batch(
        jax.random.PRNGKey(seed), starts, goals, bounds, oracles, trajectories
    )
    result = planner.solve(
        states, oracles, max_iterations=max_iterations,
        min_iterations=min_iterations, check_freq=check_freq,
    )
    paths = np.asarray(jax.block_until_ready(result.path))
    wall = time.time() - t0

    feasible = np.asarray(result.feasible)
    lengths = np.asarray(result.length)
    iterations = np.asarray(result.iterations)

    log = ResultsLog(settings={"nfomp": dict(parameters)})
    stats_list = []
    for b, scenario in enumerate(scenarios):
        occupied = np.argwhere(scenario.blocked)
        # obstacle cell centers for clearing metrics
        ox, oy = scenario.origin
        obstacle_points = np.stack(
            [
                ox + (occupied[:, 1] + 0.5) * scenario.resolution,
                oy + (occupied[:, 0] + 0.5) * scenario.resolution,
            ],
            axis=1,
        ) if len(occupied) else None
        stats = path_statistics(
            paths[b],
            obstacles=obstacle_points,
            collides=not bool(feasible[b]),
            planner=planner_name,
            planning_time=wall / len(scenarios),
            goal=np.asarray(goals[b]),
        )
        stats_list.append(stats)
        log.log_run(
            planner_name, paths[b], stats,
            extra={"iterations": int(iterations[b]), "seed_index": b},
            environment=grid_environment_info(
                scenario.blocked, scenario.resolution, scenario.origin,
                scenario.start, scenario.goal,
            ),
        )
    return SuiteResult(
        paths=paths, feasible=feasible, lengths=lengths, iterations=iterations,
        stats=stats_list, wall_time=wall, log=log,
        start_invalid=start_invalid, goal_invalid=goal_invalid,
    )
