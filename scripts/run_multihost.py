#!/usr/bin/env python3
"""Multi-host batched solving — one process per host on a TPU pod slice.

Launch on every host (e.g. with `gcloud compute tpus tpu-vm ssh --worker=all`):

    python scripts/run_multihost.py --coordinator <host0>:8476 \
        --num-processes 4 --process-id $WORKER_ID --batch-per-host 256

Each host feeds its addressable shard of a globally-sharded problem batch; the
mesh spans the full slice, metric reductions ride ICI. On a single host this
degenerates to the plain batched path (no distributed init), so the script also
serves as the single-host entry point.
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
    parser.add_argument("--coordinator", default=None, help="host0 address:port")
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    parser.add_argument("--batch-per-host", type=int, default=256)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--json-out", default=None,
                        help="write a per-host result JSON (tests use this)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nfopp_tpu.parallel import initialize_distributed

    initialize_distributed(args.coordinator, args.num_processes, args.process_id)

    import jax.numpy as jnp

    from nfopp_tpu.parallel import BatchPlanner, mean_over_problems, problem_mesh
    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.worlds import (
        RectangleOracle, car_environment, pad_obstacle_points, rectangle_collision,
    )

    mesh = problem_mesh()  # spans ALL devices across hosts after distributed init
    total_batch = args.batch_per_host * args.num_processes
    if total_batch % mesh.devices.size != 0:
        total_batch = (total_batch // mesh.devices.size + 1) * mesh.devices.size
    print(f"[host {args.process_id}] devices: {jax.device_count()} global / "
          f"{jax.local_device_count()} local; global batch {total_batch}")

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), rectangle_collision)
    planner = BatchPlanner(solver, mesh)

    starts = jnp.tile(jnp.asarray(env.start)[None], (total_batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (total_batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (total_batch, 1))
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (total_batch,) + (1,) * x.ndim), oracle
    )
    states = planner.init_batch(jax.random.PRNGKey(0), starts, goals, bounds, oracles)

    t0 = time.time()
    states, aux = planner.run(states, oracles, args.steps)
    jax.block_until_ready(states)
    elapsed = time.time() - t0
    # cross-host metric reduction: compiles to a psum over the global mesh
    # (DCN/gloo between processes) — this is SURVEY.md §2 communication job (2)
    mean_loss = float(jax.jit(mean_over_problems)(aux.trajectory_loss[:, -1]))
    mean_final_xy = float(
        jax.jit(mean_over_problems)(
            jnp.linalg.norm(states.trajectory[:, -1, :2], axis=-1)
        )
    )
    solves_per_s = total_batch * (args.steps / 1000) / elapsed
    print(f"[host {args.process_id}] {args.steps} steps x {total_batch} problems "
          f"in {elapsed:.1f}s -> {solves_per_s:.1f} solves/s slice-wide; "
          f"mean loss {mean_loss:.4f}")
    if args.json_out:
        import json

        result = {
            "process_id": args.process_id,
            "num_processes": jax.process_count(),
            "global_devices": jax.device_count(),
            "local_devices": jax.local_device_count(),
            "total_batch": total_batch,
            "steps": args.steps,
            "mean_loss": mean_loss,
            "mean_final_xy": mean_final_xy,
        }
        with open(args.json_out, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
