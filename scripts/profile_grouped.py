#!/usr/bin/env python3
"""Structural profile of the GROUPED (shared-field) step at fleet scale.

REPLAN_r04's fleet curve plateaus at ~2050 robot-replans/s from G=64, with
per-robot per-step cost converged to the independent-field solve cost
(13.0 vs 13.1 us) — VERDICT r4 weak #5 asks where the 13 us/robot goes.
This times each sub-computation of `_step_grouped` in isolation at G=64/128
(scan-probe methodology of profile_step2.py, bodies at BATCH level since the
grouped step is batch-structured), alongside the same components of the
INDEPENDENT (per-robot field) step, so the table directly shows what sharing
a field saves (expected: nothing — every robot still computes its own field
gradients; the group mean is a reshape-mean XLA fuses for free; sharing is a
*semantic* feature, one field per map, not a compute saver).

    python scripts/profile_grouped.py --sizes 64,128 [--cpu]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="64,128",
                        help="comma list of fleet sizes G (batch == G, one "
                             "shared-field group)")
    parser.add_argument("--steps", type=int, default=200,
                        help="scan length per probe")
    parser.add_argument("--repeats", type=int, default=3,
                        help="timed repeats per probe (best kept)")
    parser.add_argument("--json-out", default=None)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()

    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
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
    cfg = run_planner_config()
    solver = ConstrainedSolver(cfg, rectangle_collision)
    steps = args.steps
    print(f"device={jax.devices()[0]} steps={steps}", file=sys.stderr)

    report = {"metric": "grouped_step_profile", "steps": steps,
              "device": str(jax.devices()[0]), "sizes": []}

    for g in [int(x) for x in args.sizes.split(",")]:
        # shared-field init: one field_key for the whole group (lockstep)
        kp, kf = jax.random.split(jax.random.PRNGKey(0))
        keys = jax.random.split(kp, g)
        fkeys = jnp.tile(kf[None], (g, 1))
        states = jax.jit(jax.vmap(
            lambda k, fk: solver.init_state(
                k, jnp.asarray(env.start), jnp.asarray(env.goal),
                jnp.asarray(env.bounds, jnp.float32), oracle, field_key=fk,
            )
        ))(keys, fkeys)
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (g,) + (1,) * x.ndim), oracle
        )
        row = {"robots": g, "components_us_per_step_per_robot": {}}

        def timeit(tag, body):
            """body: batched states -> batched states. Scans `steps` times,
            reports us/step/robot (sync via scalar host fetch — CLAUDE.md)."""
            def run(s):
                out, _ = jax.lax.scan(
                    lambda c, _: (body(c), None), s, None, length=steps
                )
                return out
            f = jax.jit(run)
            t0 = time.time()
            out = f(states)
            float(jnp.sum(out.trajectory))  # drain compile+warm dispatch
            compile_s = time.time() - t0
            best = np.inf
            for _ in range(args.repeats):
                t0 = time.time()
                out = f(states)
                float(jnp.sum(out.trajectory))
                best = min(best, time.time() - t0)
            per = best / steps / g * 1e6
            print(f"G={g:4d} {tag:40s} {per:8.2f} us/step/robot "
                  f"(compile {compile_s:.1f}s)", file=sys.stderr)
            row["components_us_per_step_per_robot"][tag] = round(per, 3)

        def split3(s):
            keys = jax.vmap(lambda k: jax.random.split(k, 3))(s.key)
            return s._replace(key=keys[:, 0]), keys

        # --- full steps (no reparam; it amortizes /10 and is timed alone)
        def grouped_full(s):
            new, _ = solver._step_grouped(s, oracles, False, g)
            return new._replace(step_count=s.step_count)

        timeit("grouped full step (no reparam)", grouped_full)

        def indep_full(s):
            new, _ = jax.vmap(
                lambda st: solver.step_static(st, oracle, with_reparam=False)
            )(s)
            return new._replace(step_count=s.step_count)

        timeit("independent full step (no reparam)", indep_full)

        # --- field update, grouped (per-robot grads -> group mean -> adam)
        def grouped_field(s):
            s, keys = split3(s)
            s, _ = solver._field_step_grouped(s, oracles, keys[:, 1], g)
            return s

        timeit("field update, grouped", grouped_field)

        # --- field update, independent (no group mean)
        def indep_field(s):
            s, keys = split3(s)
            s, _ = jax.vmap(solver._field_step, in_axes=(0, None, 0))(
                s, oracle, keys[:, 1]
            )
            return s

        timeit("field update, independent", indep_field)

        # --- field grads only (sampling + fwd+bwd, no mean, no adam)
        def field_grads_only(s):
            s, keys = split3(s)
            samples, losses, grads = jax.vmap(
                solver._field_grads, in_axes=(0, None, 0)
            )(s, oracle, keys[:, 1])
            # keep the dependency chain alive without applying the update
            leaf = jax.tree_util.tree_leaves(grads)[0]
            return s._replace(
                buffer_points=samples.buffer_points
                + 0.0 * jnp.sum(leaf).astype(s.buffer_points.dtype),
                buffer_ages=samples.buffer_ages,
            )

        timeit("field grads only (sample+fwd+bwd)", field_grads_only)

        # --- field grads + group mean (isolates the reduction cost)
        def field_grads_mean(s):
            s, keys = split3(s)
            samples, losses, grads = solver._field_grads_grouped(
                s, oracles, keys[:, 1], g
            )
            leaf = jax.tree_util.tree_leaves(grads)[0]
            return s._replace(
                buffer_points=samples.buffer_points
                + 0.0 * jnp.sum(leaf).astype(s.buffer_points.dtype),
                buffer_ages=samples.buffer_ages,
            )

        timeit("field grads + group mean", field_grads_mean)

        # --- trajectory update only
        def traj_only(s):
            s, keys = split3(s)
            s, _ = jax.vmap(solver._trajectory_step)(s, keys[:, 2])
            return s

        timeit("trajectory update only", traj_only)

        # --- reparametrization only (amortized /10 in the real schedule)
        timeit("reparametrization only", lambda s: jax.vmap(
            solver._reparametrize)(s))

        report["sizes"].append(row)

    out = json.dumps(report, indent=1)
    print(out)
    if args.json_out:
        pathlib.Path(args.json_out).write_text(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
