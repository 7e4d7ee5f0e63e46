#!/usr/bin/env python3
"""Shared-field grouped-mode step cost vs plain per-problem fields (TPU).

The shared-field mode (ConstrainedSolver.run_grouped) keeps ONE ONF field per
group of problems by averaging field gradients across the group — the
framework's cross-chip communication path (the group-mean lowers to a psum
when the batch axis is sharded over a mesh; SURVEY.md §2 communication job 3).
This measures what that averaging costs on one chip at B problems with group
sizes G, against the plain per-problem-field run.

    python scripts/bench_grouped.py --batch 256 --groups 8 32 256

Same timing discipline as bench.py: chunked evolving-state loop over seconds,
scalar host fetch to synchronize (block_until_ready is unreliable through the
axon tunnel, CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def sync(tree) -> float:
    """Force a scalar host fetch (reliable sync through the tunnel)."""
    import jax

    leaf = next(iter(jax.tree_util.tree_leaves(tree)))
    return float(leaf.sum())


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--groups", type=int, nargs="+", default=[8, 32, 256])
    parser.add_argument("--chunk", type=int, default=200,
                        help="steps per timed dispatch")
    parser.add_argument("--chunks", type=int, default=3)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--json-out", default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()  # TPU-only (backend-checked)
    import jax.numpy as jnp

    from nfopp_tpu.parallel import BatchPlanner, problem_mesh
    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.worlds import (
        RectangleOracle,
        car_environment,
        pad_obstacle_points,
        rectangle_collision,
    )

    print(f"device: {jax.devices()[0]}, batch={args.batch}", file=sys.stderr)
    config = run_planner_config()
    config = config._replace(onf=config.onf._replace(compute_dtype="bfloat16"))
    solver = ConstrainedSolver(config, rectangle_collision)
    planner = BatchPlanner(solver, problem_mesh())

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    batch = args.batch
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )

    results = {}

    def timed(label, init_fn, run_fn):
        states = init_fn()
        sync(states)
        t0 = time.time()
        states = run_fn(states)  # compile + warm
        sync(states)
        print(f"{label}: compile+warm {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(args.chunks):
            states = run_fn(states)
        sync(states)
        per_step_us = (
            (time.time() - t0) / (args.chunks * args.chunk) / batch * 1e6
        )
        print(f"{label}: {per_step_us:.2f} us/step/problem", file=sys.stderr)
        results[label] = round(per_step_us, 3)
        time.sleep(2)

    timed(
        "plain",
        lambda: planner.init_batch(
            jax.random.PRNGKey(0), starts, goals, bounds, oracles
        ),
        lambda s: planner.run(s, oracles, args.chunk)[0],
    )
    for g in args.groups:
        timed(
            f"grouped_{g}",
            lambda g=g: planner.init_batch_grouped(
                jax.random.PRNGKey(0), starts, goals, bounds, oracles, g
            ),
            lambda s, g=g: planner.run_grouped(s, oracles, args.chunk, g)[0],
        )

    out = {"batch": batch, "chunk": args.chunk,
           "us_per_step_per_problem": results,
           "device": str(jax.devices()[0])}
    print(json.dumps(out), flush=True)
    if args.json_out:
        pathlib.Path(args.json_out).write_text(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
