#!/usr/bin/env python3
"""Standalone demo — the reference scripts/run_planner.py equivalent.

Car/parking scene, rectangle footprint, SE(2) constrained planner, 1000
iterations; optionally renders the field heatmap + trajectory to PNG frames.

    python scripts/run_planner.py [--show-every 100] [--out /tmp/frames]
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
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--show-every", type=int, default=0,
                        help="render a PNG frame every K iterations (0 = off)")
    parser.add_argument("--out", default="/tmp/nfopp_frames")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.models import onf_apply
    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.solver.tracking import evaluate_path
    from nfopp_tpu.worlds import (
        RectangleOracle,
        car_environment,
        pad_obstacle_points,
        rectangle_collision,
    )

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), rectangle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(args.seed), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    chunk = args.show_every if args.show_every > 0 else args.iterations
    run = jax.jit(lambda s, o: solver.run(s, o, chunk))

    out_dir = pathlib.Path(args.out)
    if args.show_every:
        out_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.time()
    done = 0
    frame = 0
    while done < args.iterations:
        state, aux = run(state, oracle)
        done += chunk
        if args.show_every:
            from matplotlib import pyplot as plt

            from nfopp_tpu.plotting import plot_planner_data

            fig = plt.figure(dpi=150)
            path = np.asarray(solver.full_trajectory(state))
            field_fn = lambda q: onf_apply(state.field_params, jnp.asarray(q), solver.config.onf)
            plot_planner_data(path, field_fn, env.bounds, env.obstacle_points)
            fig.savefig(out_dir / f"frame_{frame:04d}.png")
            plt.close(fig)
            frame += 1
        print(f"iter {done}: field_loss={float(aux.field_loss[-1]):.4f} "
              f"traj_loss={float(aux.trajectory_loss[-1]):.4f}")
    elapsed = time.time() - t0

    path = solver.full_trajectory(state)
    collides, length = evaluate_path(rectangle_collision, oracle, path)
    print(f"done in {elapsed:.2f}s  ({elapsed / args.iterations * 1e3:.3f} ms/iter)")
    print(f"final path: length={float(length):.3f} collision_free={not bool(collides)}")
    return 0 if not bool(collides) else 1


if __name__ == "__main__":
    raise SystemExit(main())
