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
from .metrics import active_evaluator, path_statistics
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
    # provenance: how many infeasible problems the shortcut pass chord-
    # repaired to feasible (solver-feasibility vs post-process rescue stay
    # attributable in parity claims), and how many restart rounds ran
    repaired_by_shortcut: int = 0
    restart_rounds_used: int = 0


def _shortcut_pass(solver, oracles, paths, lengths, feasible, key, trials,
                   samples_per_segment: int = 5):
    """Random-pair shortcut pass over a whole path batch.

    Returns updated (paths, lengths, feasible, repaired_mask[B]). A candidate
    is taken whenever its dense re-check passes — accepted shortcuts can't
    break feasibility at the same sampling density, and a chord spanning an
    infeasible path's colliding span can even REPAIR it; the per-lane repaired
    mask lets callers attribute rescues exactly (restart lanes map back to
    problem indices, so one repair is never counted per-lane)."""
    from ..ops.shortcut import shortcut_batch
    from ..solver.tracking import evaluate_path

    short = jax.jit(
        lambda o, p, k: shortcut_batch(solver.oracle_fn, o, p, k, trials)
    )(oracles, jnp.asarray(paths), key)
    collides_s, lengths_s = jax.jit(jax.vmap(
        lambda o, p: evaluate_path(solver.oracle_fn, o, p, samples_per_segment)
    ))(oracles, short)
    take = ~np.asarray(collides_s)
    repaired_mask = take & ~feasible
    paths = paths.copy()
    lengths = lengths.copy()
    paths[take] = np.asarray(short)[take]
    lengths[take] = np.asarray(lengths_s)[take]
    return paths, lengths, feasible | take, repaired_mask


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
    stop_on_plateau: bool = True,
    restart_failed: int = 0,
    checkpoint_path=None,
    checkpoint_every_chunks: int = 4,
    resume: bool = False,
    shortcut_trials: int = 0,
    restart_rounds: int = 1,
    require_native_evaluator: bool = False,
    solve_oracles=None,
    oracle_fn=None,
    obstacle_segments: list | None = None,
    aot: bool = False,
) -> SuiteResult:
    """Solve every scenario in one batch; scenarios must share grid shape.

    astar_init=True seeds each problem with a batched wavefront geodesic path
    (the benchmark-mode AstarTrajectoryInitializer role, run_bench_mr.py:23-27),
    computed on device against the footprint-dilated grid.

    stop_on_plateau=False spends the full iteration budget refining instead of
    stopping at the reference's first non-improving feasible check (see
    solver.tracking.run_with_tracking).

    restart_failed=R > 0 re-solves every infeasible problem as a batch of R
    fresh random restarts (same world, same init trajectory, new RNG streams)
    and keeps the shortest feasible restart — the portfolio fallback for
    chaotic problems (the NFOPP objective is seed-dependent; restarts ride the
    same batch machinery, so a retry round costs one extra batched solve).
    restart_rounds=M > 1 iterates the fallback: problems still infeasible
    after a round get another R fresh streams, up to M rounds or until every
    problem is feasible (stop-at-feasible-or-budget; measured on the forest
    suite: the one seed that survives R=8 falls to a second round). The cheap
    shortcut/repair pass (if enabled) runs BEFORE the restart decision, so a
    chord-repairable problem never burns R full re-solves.

    checkpoint_path enables elastic mid-suite recovery (the §5 row the
    reference lacks): the tracked solve checkpoints its carry every
    `checkpoint_every_chunks` chunks (BatchPlanner.solve_checkpointed); the
    retry phase uses a sibling '<name>-retry.npz' file. resume=True picks up
    from the newest checkpoint — everything up to the solve (world build,
    init, wavefront) is deterministic, so a killed-and-resumed suite is
    bit-identical to an uninterrupted checkpointed one.

    shortcut_trials=T > 0 runs T random-pair shortcut attempts per path after
    the solve (ops/shortcut.py — the OMPL PathSimplifier role the reference
    never invokes). Feasible paths only get shorter at the same dense-check
    density; an infeasible path is usually a no-op, but a chord spanning its
    colliding region can repair it — repaired paths pass the dense re-check
    and are counted feasible.
    """
    if parameters is None:
        parameters = DEFAULT_PARAMETERS
    # fail BEFORE the solve: an unavailable native library must not discard
    # minutes of TPU time at evaluation (checked again post-solve for the log)
    if require_native_evaluator and active_evaluator() != "native":
        raise RuntimeError(
            "native path-statistics evaluator requested but unavailable "
            "(bench/native build failed?) — refusing to start a suite whose "
            "artifacts would silently be numpy-evaluated"
        )
    config = config_from_parameters(parameters)
    # solve_oracles + oracle_fn override the rasterized grid oracle with
    # EXACT geometry (e.g. worlds.oracle.PolygonOracle/polygon_collision —
    # the reference's polygon worlds are checked exactly via OMPL state
    # validity, BenchmarkAdapter.cpp:175-187). The wavefront initializer
    # still seeds from the rasterized grid (a heuristic is allowed to be
    # approximate); every solve/evaluation/shortcut check is exact.
    oracle_fn = oracle_fn if oracle_fn is not None else grid_collision
    solver = ConstrainedSolver(config, oracle_fn)
    # aot=True routes the big solve/init programs through the AOT executable
    # store: a warm store starts the suite with ZERO remote-compile-service
    # round trips (utils/aot.py; keys carry source+shape identity)
    planner = BatchPlanner(
        solver, mesh if mesh is not None else problem_mesh(),
        aot_prefix="suite" if aot else None,
    )

    grid_oracles_list = [s.oracle(footprint_radius) for s in scenarios]
    grid_oracles = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *grid_oracles_list
    )
    oracles = solve_oracles if solve_oracles is not None else grid_oracles
    starts = jnp.asarray(np.stack([s.start for s in scenarios]))
    goals = jnp.asarray(np.stack([s.goal for s in scenarios]))
    bounds = jnp.asarray(
        np.stack([np.asarray(s.bounds, np.float32) for s in scenarios])
    )

    # start/goal validity precheck against the solve oracles
    endpoint_check = jax.jit(
        jax.vmap(lambda o, s, g: oracle_fn(o, jnp.stack([s, g])))
    )(oracles, starts, goals)
    endpoint_check = np.asarray(endpoint_check)
    start_invalid, goal_invalid = endpoint_check[:, 0], endpoint_check[:, 1]

    t0 = time.time()
    trajectories = None
    if astar_init:
        from ..astar.initializer import batched_wavefront_trajectories

        grids = grid_oracles.occupancy  # footprint-dilated occupancy [B, H, W]
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
    if checkpoint_path is not None:
        result = planner.solve_checkpointed(
            states, oracles, checkpoint_path, max_iterations=max_iterations,
            min_iterations=min_iterations, check_freq=check_freq,
            stop_on_plateau=stop_on_plateau,
            checkpoint_every_chunks=checkpoint_every_chunks, resume=resume,
        )
    else:
        result = planner.solve(
            states, oracles, max_iterations=max_iterations,
            min_iterations=min_iterations, check_freq=check_freq,
            stop_on_plateau=stop_on_plateau,
        )
    paths = np.asarray(jax.block_until_ready(result.path)).copy()
    feasible = np.asarray(result.feasible).copy()
    lengths = np.asarray(result.length).copy()
    iterations = np.asarray(result.iterations).copy()

    # cheap shortcut/repair pass FIRST: a chord-repairable problem must not
    # burn restart_failed full re-solves (the repair is ~free)
    repaired_total = 0
    if shortcut_trials > 0:
        paths, lengths, feasible, rep_mask = _shortcut_pass(
            solver, oracles, paths, lengths, feasible,
            jax.random.PRNGKey(seed ^ 0x5C0C), shortcut_trials,
        )
        repaired_total += int(rep_mask.sum())  # base batch: one lane == one problem

    rounds_used = 0
    for rnd in range(restart_rounds if restart_failed > 0 else 0):
        if feasible.all():
            break
        rounds_used += 1
        failed = np.where(~feasible)[0]
        r = restart_failed
        total = len(failed) * r
        # problem-major replication, padded so the retry batch shards evenly
        sel = np.repeat(failed, r)
        pad = (-total) % planner.mesh.devices.size
        if pad:
            sel = np.concatenate([sel, np.repeat(failed[-1:], pad)])
        idx = jnp.asarray(sel)
        rep_ = lambda x: jnp.asarray(x)[idx]
        oracles_f = jax.tree_util.tree_map(rep_, oracles)
        retry_seed = seed ^ (0x5EED0F + rnd * 0x9E3779)
        states_f = planner.init_batch(
            jax.random.PRNGKey(retry_seed), rep_(starts), rep_(goals),
            rep_(bounds),
            oracles_f,
            None if trajectories is None else rep_(trajectories),
        )
        if checkpoint_path is not None:
            import pathlib

            cp = pathlib.Path(checkpoint_path)
            suffix = "-retry.npz" if rnd == 0 else f"-retry{rnd}.npz"
            retry_path = cp.with_name(cp.name.replace(".npz", "") + suffix)
            retry = planner.solve_checkpointed(
                states_f, oracles_f, retry_path,
                max_iterations=max_iterations,
                min_iterations=min_iterations, check_freq=check_freq,
                stop_on_plateau=stop_on_plateau,
                checkpoint_every_chunks=checkpoint_every_chunks, resume=resume,
            )
        else:
            retry = planner.solve(
                states_f, oracles_f, max_iterations=max_iterations,
                min_iterations=min_iterations, check_freq=check_freq,
                stop_on_plateau=stop_on_plateau,
            )
        r_paths_flat = np.asarray(retry.path).copy()
        r_feas_flat = np.asarray(retry.feasible).copy()
        r_len_flat = np.asarray(retry.length).copy()
        r_repaired_flat = np.zeros(len(r_feas_flat), bool)
        if shortcut_trials > 0:
            # restarts get the same repair chance as the base solve
            r_paths_flat, r_len_flat, r_feas_flat, r_repaired_flat = (
                _shortcut_pass(
                    solver, oracles_f, r_paths_flat, r_len_flat, r_feas_flat,
                    jax.random.PRNGKey(retry_seed ^ 0x5C0C), shortcut_trials,
                )
            )
        r_paths = r_paths_flat[:total].reshape(len(failed), r, *paths.shape[1:])
        r_feas = r_feas_flat[:total].reshape(len(failed), r)
        r_len = r_len_flat[:total].reshape(len(failed), r)
        r_iter = np.asarray(retry.iterations)[:total].reshape(len(failed), r)
        r_repaired = r_repaired_flat[:total].reshape(len(failed), r)
        for j, b in enumerate(failed):
            ok = np.where(r_feas[j])[0]
            if len(ok):
                best = ok[np.argmin(r_len[j][ok])]
                paths[b] = r_paths[j, best]
                lengths[b] = r_len[j, best]
                feasible[b] = True
                # a problem counts as shortcut-repaired only if the lane the
                # selection actually kept owes its feasibility to the chord
                # repair (per PROBLEM, never per lane: restart lanes + pad
                # duplicates previously inflated this provenance field)
                repaired_total += int(r_repaired[j, best])
                # total optimization spent on this problem: first try + restarts
                iterations[b] = iterations[b] + int(r_iter[j, best])
    wall = time.time() - t0

    evaluator = active_evaluator()
    if require_native_evaluator and evaluator != "native":
        raise RuntimeError(
            "native path-statistics evaluator requested but unavailable "
            "(bench/native build failed?) — refusing to emit numpy-evaluated "
            "artifacts silently"
        )
    log = ResultsLog(settings={
        "nfomp": dict(parameters),
        "evaluator": evaluator,
        "suite": {
            "shortcut_trials": shortcut_trials,
            "repaired_by_shortcut": repaired_total,
            "restart_failed": restart_failed,
            "restart_rounds": restart_rounds,
            "restart_rounds_used": rounds_used,
            "stop_on_plateau": stop_on_plateau,
            **({"aot_events": planner.aot_events} if aot else {}),
        },
    })
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
            obstacle_segments=(
                None if obstacle_segments is None else obstacle_segments[b]
            ),
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
        repaired_by_shortcut=repaired_total, restart_rounds_used=rounds_used,
    )
