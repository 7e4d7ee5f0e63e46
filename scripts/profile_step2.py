#!/usr/bin/env python3
"""Structural profile: time individual step components in isolation.

Unlike profile_step.py (config ablations — useless under vmap where lax.cond
executes both branches), this scans each sub-computation directly.
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nfopp_tpu.models import onf_apply
    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
    from nfopp_tpu.solver.field import field_loss_and_grad, sample_field_points
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
    cfg = run_planner_config()
    solver = ConstrainedSolver(cfg, rectangle_collision)
    batch, steps = args.batch, args.steps
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    init = jax.jit(jax.vmap(lambda k: solver.init_state(
        k, jnp.asarray(env.start), jnp.asarray(env.goal),
        jnp.asarray(env.bounds, jnp.float32), oracle)))
    states = init(keys)
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle)
    print(f"device={jax.devices()[0]} batch={batch} steps={steps}")

    def timeit(tag, scan_body):
        def run(s):
            def body(carry, _):
                return scan_body(carry), None
            out, _ = jax.lax.scan(body, s, None, length=steps)
            return out
        f = jax.jit(jax.vmap(run))
        t0 = time.time()
        out = jax.block_until_ready(f(states))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            out = jax.block_until_ready(f(states))
            best = min(best, time.time() - t0)
        per = best / steps / batch * 1e6
        print(f"{tag:32s} {per:8.2f} us/step/problem (compile {compile_s:.1f}s)")

    # full steps for calibration
    def full(s):
        new, _ = solver.step_static(s, oracles_single(s), with_reparam=False)
        return new

    # capture a single-problem oracle closure via the vmapped axis:
    # inside vmap each lane sees its own slice of `oracles` only if passed in.
    # Simpler: close over the single oracle (identical worlds).
    def oracles_single(_):
        return oracle

    timeit("full step (no reparam)", full)

    def traj_only(s):
        key, k = jax.random.split(s.key)
        s = s._replace(key=key)
        new, _ = solver._trajectory_step(s, k)
        return new

    timeit("trajectory update only", traj_only)

    def field_only(s):
        key, k = jax.random.split(s.key)
        s = s._replace(key=key)
        new, _ = solver._field_step(s, oracle, k)
        return new

    timeit("field update only", field_only)

    def sample_only(s):
        key, k = jax.random.split(s.key)
        sample = sample_field_points(
            cfg, k, s.prev_trajectory, s.buffer_points, s.buffer_ages,
            s.field_params, s.bounds)
        return s._replace(key=key, buffer_points=sample.buffer_points,
                          buffer_ages=sample.buffer_ages)

    timeit("field sampling+buffer only", sample_only)

    def field_grad_only(s):
        key, k = jax.random.split(s.key)
        # fixed points: isolate grad+adam cost from sampling
        points = s.buffer_points
        truth = rectangle_collision(oracle, points)
        loss, grads = field_loss_and_grad(cfg, s.field_params, points, truth)
        import optax
        updates, opt_state = solver._field_opt.update(
            grads, s.field_opt_state, s.field_params)
        return s._replace(key=key, field_params=optax.apply_updates(s.field_params, updates),
                          field_opt_state=opt_state)

    timeit("field fwd+bwd+adam (K pts)", field_grad_only)

    def reparam_only(s):
        return solver._reparametrize(s)

    timeit("reparametrization only", reparam_only)

    def onf_fwd_only(s):
        out = onf_apply(s.field_params, s.buffer_points, cfg.onf)
        return s._replace(trajectory=s.trajectory + 0.0 * jnp.sum(out))

    timeit("onf forward only (K pts)", onf_fwd_only)


if __name__ == "__main__":
    main()
