#!/usr/bin/env python3
"""Sustained anytime-serving throughput: a refilling batch server on-device.

`bench.py --anytime` measures one batch under the reference's early-stop
semantics; its solves/s is bounded by the batch's SLOWEST lane (the batched
while_loop waits for the max-iteration lane: 450-650 iterations while the
mean lane plateaus at ~325). A real server refills finished lanes with new
problems, so its sustained rate follows the MEAN, not the max.

This measures that directly: B lanes run 50-step chunks; after each chunk
every lane is checked under the reference stop rule (feasible and
non-improving past min_iterations — run_bench_mr.py:111-127); completed
lanes are counted and INSTANTLY replaced by fresh pre-initialized problem
states gathered from a device-resident pool (same scene, fresh RNG streams —
the bench workload). Everything after pool init is one compiled chunk
program in a host loop; sustained solves/s = completions / loop wall time.

    python scripts/anytime_server.py [--batch 256 --pool-rounds 4 --chunks 40]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--pool-rounds", type=int, default=4,
                        help="pool size = batch * pool-rounds fresh states")
    parser.add_argument("--chunks", type=int, default=40,
                        help="timed 50-step chunks (40 = 2000 iterations of "
                             "server time)")
    parser.add_argument("--check-freq", type=int, default=50)
    parser.add_argument("--min-iterations", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--json-out", default=None)
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()
    import jax.numpy as jnp

    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.solver.tracking import evaluate_path
    from nfopp_tpu.worlds import (
        RectangleOracle, car_environment, pad_obstacle_points,
        rectangle_collision,
    )

    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    config = run_planner_config()._replace(
        onf=run_planner_config().onf._replace(compute_dtype="bfloat16"),
        scan_unroll=9,
    )
    solver = ConstrainedSolver(config, rectangle_collision)
    b, freq = args.batch, args.check_freq
    device = jax.devices()[0]
    print(f"device: {device}, batch={b}, pool={b * args.pool_rounds}, "
          f"chunks={args.chunks}x{freq}", file=sys.stderr, flush=True)

    start = jnp.asarray(env.start)
    goal = jnp.asarray(env.goal)
    bounds = jnp.asarray(env.bounds, jnp.float32)
    init = jax.jit(jax.vmap(
        lambda k: solver.init_state(k, start, goal, bounds, oracle)
    ))

    t0 = time.time()
    keys = jax.random.split(jax.random.PRNGKey(args.seed),
                            b * (1 + args.pool_rounds))
    states = init(keys[:b])
    # pool in batch-sized slices: ONE compiled init program, B>=512 programs
    # upset the remote compile service (CLAUDE.md)
    pool_parts = [init(keys[b * (i + 1): b * (i + 2)])
                  for i in range(args.pool_rounds)]
    pool = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *pool_parts
    )
    np.asarray(jax.tree_util.tree_leaves(pool)[0][0])  # host-fetch sync
    init_s = time.time() - t0
    print(f"pool init: {init_s:.1f}s for {b * (1 + args.pool_rounds)} states",
          file=sys.stderr, flush=True)

    pool_n = b * args.pool_rounds

    def chunk_step(pool, states, best, iters, cursor, completed,
                   length_sum):
        """One 50-step chunk + reference stop rule + instant refill.
        `pool` is an ARGUMENT, not a closure: a closed-over pool is
        baked into the program as constants and a big one overflows the
        remote compile service's request-size limit (HTTP 413 at 2304
        states, measured)."""
        states, _ = jax.vmap(solver.run, in_axes=(0, None, None))(
            states, oracle, freq
        )
        collides, length = jax.vmap(
            lambda st: evaluate_path(
                rectangle_collision, oracle, solver.full_trajectory(st)
            )
        )(states)
        iters = iters + freq
        feasible = ~collides
        improving = feasible & (length < best)
        best = jnp.where(improving, length, best)
        # run_bench_mr.py:119-127: past min_iterations a feasible,
        # NON-improving check ends the solve (the best path is returned)
        done = (iters > args.min_iterations) & feasible & ~improving
        # refill: lane j (done) takes pool[cursor + rank(j)]; when the pool
        # runs dry the lane keeps optimizing (masked) and is not counted
        rank = jnp.cumsum(done) - 1
        src = cursor + jnp.where(done, rank, 0)
        in_pool = done & (src < pool_n)
        src = jnp.minimum(src, pool_n - 1)
        fresh = jax.tree_util.tree_map(lambda p: jnp.take(p, src, axis=0), pool)
        states = jax.tree_util.tree_map(
            lambda f, s: jnp.where(
                in_pool.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh, states,
        )
        completed = completed + jnp.sum(in_pool)
        length_sum = length_sum + jnp.sum(jnp.where(in_pool, best, 0.0))
        best = jnp.where(in_pool, jnp.inf, best)
        iters = jnp.where(in_pool, 0, iters)
        cursor = cursor + jnp.sum(in_pool)
        return states, best, iters, cursor, completed, length_sum

    step = jax.jit(chunk_step)

    best = jnp.full((b,), jnp.inf, jnp.float32)
    iters = jnp.zeros((b,), jnp.int32)
    cursor = jnp.zeros((), jnp.int32)
    completed = jnp.zeros((), jnp.int32)
    length_sum = jnp.zeros((), jnp.float32)

    # warm dispatch (compile), drained by host fetch before the clock.
    # Warm with DIFFERENT inputs (best=0) than the timed first chunk:
    # replaying an identical (executable, inputs) pair through the tunnel
    # can return near-instantly and shave the first timed chunk (CLAUDE.md).
    w = step(pool, states, jnp.zeros_like(best), iters, cursor,
             completed, length_sum)
    float(w[4])
    print("chunk program compiled+warm", file=sys.stderr, flush=True)

    t0 = time.time()
    carry = (states, best, iters, cursor, completed, length_sum)
    for _ in range(args.chunks):
        carry = step(pool, *carry)
    states, best, iters, cursor, completed, length_sum = carry
    n_done = int(completed)  # host fetch syncs the chain
    elapsed = time.time() - t0

    exhausted = bool(int(cursor) >= pool_n)
    sustained = n_done / elapsed
    mean_len = float(length_sum) / max(n_done, 1)
    result = {
        "metric": "anytime_sustained_solves_per_s_per_chip",
        "value": round(sustained, 3),
        "unit": "solves/s",
        "vs_baseline": round(sustained * 7.966, 1),
        "completed_solves": n_done,
        "elapsed_s": round(elapsed, 3),
        "batch": b,
        "chunks": args.chunks,
        "server_iterations": args.chunks * freq,
        "mean_length_completed": round(mean_len, 4),
        "pool_init_s": round(init_s, 1),
        "pool_exhausted": exhausted,
        "semantics": "reference early-stop per lane (feasible & non-improving "
                     "check past 200 iters, run_bench_mr.py:111-127); "
                     "completed lanes instantly refilled from a device pool "
                     "of fresh problems — the sustained-serving rate the "
                     "batch-bound --anytime number lower-bounds",
        "note": "every completion was a FEASIBLE solve by construction; "
                "mean_length_completed is the tracked best at completion",
        "device": str(device),
    }
    if exhausted:
        result["warning"] = ("refill pool ran dry before the last chunk - "
                             "sustained rate understated; raise --pool-rounds")
    out = json.dumps(result)
    print(out)
    if args.json_out:
        pathlib.Path(args.json_out).write_text(
            json.dumps(result, indent=1) + "\n"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
