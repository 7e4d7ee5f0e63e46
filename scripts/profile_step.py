#!/usr/bin/env python3
"""Ablation profile of the solver step on real hardware.

Measures per-step/per-problem time for the full step and with individual
pieces ablated (field update off, buffer resample off, cheap PRNG, ...) to
locate the bottleneck without a full trace.

    python scripts/profile_step.py --batch 256 [--cpu]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def measure(tag, run, states, oracles, steps):
    import jax

    t0 = time.time()
    out, _ = run(states, oracles)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out, _ = run(states, oracles)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    batch = states.trajectory.shape[0]
    per = min(times) / steps / batch * 1e6
    print(f"{tag:35s} {per:8.2f} us/step/problem  (compile {compile_s:.1f}s)")
    return per


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=50)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.worlds import (
        RectangleOracle, car_environment, pad_obstacle_points, rectangle_collision,
    )

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    batch, steps = args.batch, args.steps
    print(f"device={jax.devices()[0]} batch={batch} steps={steps}")

    def build(config):
        solver = ConstrainedSolver(config, rectangle_collision)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        init = jax.jit(jax.vmap(
            lambda k: solver.init_state(
                k, jnp.asarray(env.start), jnp.asarray(env.goal),
                jnp.asarray(env.bounds, jnp.float32), oracle)
        ))
        states = init(keys)
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle)
        run = jax.jit(lambda s, o: jax.vmap(solver.run, in_axes=(0, 0, None))(s, o, steps))
        return solver, states, oracles, run

    base_cfg = run_planner_config()

    solver, states, oracles, run = build(base_cfg)
    full = measure("full step", run, states, oracles, steps)

    # field update never fires
    _, s2, o2, run2 = build(base_cfg._replace(optimize_collision_model_freq=1_000_000))
    measure("no field update", run2, s2, o2, steps)

    # reparametrization never fires
    _, s3, o3, run3 = build(base_cfg._replace(reparametrize_trajectory_freq=1_000_000))
    measure("no reparametrization", run3, s3, o3, steps)

    # smaller replay buffer -> smaller top_k sort + field batch
    _, s4, o4, run4 = build(base_cfg._replace(collision_point_count=32))
    measure("buffer K=32 (topk+batch smaller)", run4, s4, o4, steps)

    # both heavy pieces off: the floor (trajectory update only)
    _, s5, o5, run5 = build(
        base_cfg._replace(optimize_collision_model_freq=1_000_000,
                          reparametrize_trajectory_freq=1_000_000)
    )
    measure("trajectory update only", run5, s5, o5, steps)
    print("done")


if __name__ == "__main__":
    main()
