#!/usr/bin/env python3
"""Two-walls reliability probe: portfolio restarts vs single solves.

The reference does not reliably solve its own demo scene (two offset walls,
scripts/run_planner's sibling scene; measured ~12 % collision at 1000 iters —
see CLAUDE.md / BASELINE_MEASURED.md). This probe measures, over S seeds:
  (a) single-solve feasibility (the reference-equivalent behavior),
  (b) portfolio feasibility (restarts=R random restarts, best feasible picked),
  (c) portfolio with a shared field across restarts.

    python scripts/two_walls_reliability.py --seeds 10 --restarts 8
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=10)
    parser.add_argument("--restarts", type=int, default=8)
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    # TPU-only, backend-checked (this very probe once diverged on a chaotic
    # scene when cross-machine cached CPU AOT entries were loaded)
    enable_tpu_compile_cache()
    import jax.numpy as jnp

    from nfopp_tpu.parallel import BatchPlanner, problem_mesh
    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.worlds import (
        CircleOracle,
        circle_collision,
        pad_obstacle_points,
        two_walls_se2_environment,
    )

    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), circle_collision)
    planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))

    single_ok, portfolio_ok, shared_ok = [], [], []
    for seed in range(args.seeds):
        key = jax.random.PRNGKey(seed)
        res1 = planner.solve_portfolio(
            key, env.start, env.goal, env.bounds, oracle,
            restarts=1, max_iterations=args.iterations,
        )
        single_ok.append(bool(res1.feasible))
        resp = planner.solve_portfolio(
            key, env.start, env.goal, env.bounds, oracle,
            restarts=args.restarts, max_iterations=args.iterations,
        )
        portfolio_ok.append(bool(resp.feasible))
        ress = planner.solve_portfolio(
            key, env.start, env.goal, env.bounds, oracle,
            restarts=args.restarts, max_iterations=args.iterations,
            shared_field=True,
        )
        shared_ok.append(bool(ress.feasible))
        print(
            f"seed {seed}: single={single_ok[-1]} "
            f"portfolio={portfolio_ok[-1]} shared={shared_ok[-1]}",
            file=sys.stderr, flush=True,
        )

    result = {
        "metric": "two_walls_feasible_rate",
        "seeds": args.seeds,
        "restarts": args.restarts,
        "iterations": args.iterations,
        "single": sum(single_ok) / args.seeds,
        "portfolio": sum(portfolio_ok) / args.seeds,
        "portfolio_shared_field": sum(shared_ok) / args.seeds,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
