#!/usr/bin/env python3
"""GPMP2 comparison baseline over benchmark worlds — the reference
scripts/run_gpmp2.py role (gtsam/gpmp2 replaced by the JAX implementation in
nfopp_tpu.baselines.gpmp2), batched across all seeds at once.

    python scripts/run_gpmp2.py --suite corridor --seeds 4 [--cpu]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--suite", choices=["corridor", "forest", "movingai"],
                        default="corridor")
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--footprint-radius", type=float, default=1.0)
    parser.add_argument("--min-geodesic", type=float, default=0.0,
                        help="resample endpoints until the grid geodesic is at "
                        "least this long (bench-mr's recorded corridor runs "
                        "have ~170-length paths; uniform draws are shorter)")
    parser.add_argument("--out", default="/tmp/nfopp_gpmp2_results.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.astar.initializer import batched_wavefront_trajectories
    from nfopp_tpu.baselines import GPMP2Config, build_sdf, gpmp2_plan
    from nfopp_tpu.bench import ResultsLog, path_statistics
    from nfopp_tpu.utils.host_math import calculate_tangent
    from nfopp_tpu.worlds import (
        corridor, grid_collision, random_forest, resample_distant_endpoints,
    )

    if args.suite == "movingai":
        # the committed city 256x256 fixture + .scen endpoints — the same
        # worlds as run_benchmark.py/compare_suites.py movingai. (The
        # reference's committed GPMP2 MovingAI number ran bench-mr's
        # Berlin_0_256 scenario, movingai_experiment_gpmp2.ipynb cell 7 —
        # not in its repo, so the suites differ in map; both are MovingAI
        # city-class 256x256 grids.)
        from nfopp_tpu.worlds import parse_movingai_map, parse_movingai_scen
        from nfopp_tpu.worlds.scenarios import GridScenario

        root = pathlib.Path(__file__).resolve().parent.parent
        base = parse_movingai_map(
            (root / "assets/movingai/city_0_256.map").read_text())
        entries = parse_movingai_scen(
            (root / "assets/movingai/city_0_256.map.scen").read_text()
        )[: args.seeds]
        scenarios = [
            GridScenario(
                base.blocked, base.resolution, base.origin,
                np.array([e["start_x"] + 0.5, e["start_y"] + 0.5, 0.0],
                         np.float32),
                np.array([e["goal_x"] + 0.5, e["goal_y"] + 0.5, 0.0],
                         np.float32),
            )
            for e in entries
        ]
    else:
        make = corridor if args.suite == "corridor" else (
            lambda seed: random_forest(seed=seed))
        scenarios = resample_distant_endpoints(
            [make(seed=s) for s in range(args.seeds)], args.min_geodesic
        )

    oracles = [s.oracle(args.footprint_radius) for s in scenarios]
    sdfs = [
        build_sdf(np.asarray(o.occupancy), s.resolution, s.origin)
        for s, o in zip(scenarios, oracles)
    ]
    import jax.tree_util as jtu

    sdf_batch = jtu.tree_map(lambda *x: jnp.stack(x), *sdfs)
    starts = jnp.asarray(np.stack([s.start[:2] for s in scenarios]))
    goals = jnp.asarray(np.stack([s.goal[:2] for s in scenarios]))

    # A*-equivalent initialization, as the reference does (run_gpmp2.py:52-60)
    grids = jnp.stack([o.occupancy for o in oracles])
    starts3 = jnp.asarray(np.stack([s.start for s in scenarios]))
    goals3 = jnp.asarray(np.stack([s.goal for s in scenarios]))
    origins = jnp.asarray(np.stack([np.asarray(s.origin, np.float32) for s in scenarios]))
    res = jnp.asarray(np.asarray([s.resolution for s in scenarios], np.float32))
    config = GPMP2Config(num_steps=100)
    init_xy = jax.jit(batched_wavefront_trajectories, static_argnums=5)(
        grids, starts3, goals3, origins, res, config.num_steps - 2
    )[:, :, :2]
    init_xy = jnp.concatenate([starts[:, None], init_xy, goals[:, None]], axis=1)

    plan = jax.jit(jax.vmap(lambda s, st, gl, ix: gpmp2_plan(s, st, gl, config, ix)))
    t0 = time.time()
    states = jax.block_until_ready(plan(sdf_batch, starts, goals, init_xy))
    wall = time.time() - t0

    log = ResultsLog(environment_info={"suite": args.suite})
    print(f"{'#':>3} {'collides':>9} {'length':>9} {'smooth':>8}")
    for b, scenario in enumerate(scenarios):
        xy = np.asarray(states[b, :, :2])
        t = np.linspace(0, 1, len(xy))
        theta = calculate_tangent(xy[:, 0], xy[:, 1], t)
        path = np.concatenate([xy, theta[:, None]], axis=1)
        dense_idx = np.linspace(0, len(path) - 1, 500)
        dense = np.stack([np.interp(dense_idx, np.arange(len(path)), path[:, k]) for k in range(3)], axis=1)
        collides = bool(
            np.asarray(grid_collision(oracles[b], jnp.asarray(dense, jnp.float32))).any()
        )
        stats = path_statistics(
            path, collides=collides, planner="gpmp2_jax",
            planning_time=wall / len(scenarios), goal=scenario.goal,
        )
        log.log_run("gpmp2_jax", path, stats)
        print(f"{b:>3} {str(collides):>9} {stats.path_length:>9.2f} {stats.smoothness:>8.3f}")
    out = log.save(args.out)
    print(f"wall {wall:.2f}s for {len(scenarios)} problems (batched); saved {out}")


if __name__ == "__main__":
    main()
