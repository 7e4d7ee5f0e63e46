#!/usr/bin/env python3
"""Seed-averaged quality parity: this framework vs the PyTorch reference.

Runs both implementations on the reference demo problem (car/parking scene,
rectangle footprint, run_planner.py configuration, 1000 iterations) across N
seeds and compares, with a COMMON evaluation (dense-path collision check +
xy path length computed by this repo's metrics):

  * feasibility rate (collision-free final paths)
  * mean feasible path length  (the "final trajectory cost within 1%" anchor —
    RNG streams differ between frameworks, so the comparison is seed-averaged,
    BASELINE.md methodology)

The reference is imported IN PLACE from /root/reference (a pytorch_lightning
AttributeDict stub is injected; no reference code is copied). Skips the
reference half gracefully if torch or the reference tree is unavailable.

    python scripts/compare_with_reference.py --seeds 5 --cpu
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_PATH = "/root/reference"


def _install_lightning_stub():
    """Minimal AttributeDict so the reference's factory imports."""
    if "pytorch_lightning" in sys.modules:
        return

    class AttributeDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    pl = types.ModuleType("pytorch_lightning")
    utilities = types.ModuleType("pytorch_lightning.utilities")
    parsing = types.ModuleType("pytorch_lightning.utilities.parsing")
    parsing.AttributeDict = AttributeDict
    utilities.parsing = parsing
    utilities.AttributeDict = AttributeDict
    pl.utilities = utilities
    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.utilities"] = utilities
    sys.modules["pytorch_lightning.utilities.parsing"] = parsing


def reference_run(seed: int, iterations: int):
    """One reference solve; returns (path [102, 3], seconds)."""
    sys.path.insert(0, REFERENCE_PATH)
    _install_lightning_stub()
    import torch

    torch.random.manual_seed(seed)
    np.random.seed(seed + 300)
    from pytorch_lightning.utilities import AttributeDict
    from neural_field_optimal_planner.collision_checker import RectangleCollisionChecker
    from neural_field_optimal_planner.planner_factory import PlannerFactory
    from neural_field_optimal_planner.test_environment_builder import TestEnvironmentBuilder

    import torch.autograd

    torch.autograd.set_detect_anomaly(False)

    params = AttributeDict(
        device="cpu",
        trajectory_length=100,
        collision_model=AttributeDict(
            mean=0, sigma=1, use_cos=True, bias=True, use_normal_init=True,
            angle_encoding=True, name="ONF",
        ),
        trajectory_initializer=AttributeDict(name="TrajectoryInitializer", resolution=0.05),
        collision_optimizer=AttributeDict(lr=5e-2, betas=(0.9, 0.9)),
        trajectory_optimizer=AttributeDict(lr=1e-2, betas=(0.9, 0.9)),
        planner=AttributeDict(
            name="ConstrainedNERFOptPlanner", trajectory_random_offset=0.02,
            collision_weight=1, velocity_hessian_weight=0.5, random_field_points=10,
            init_collision_iteration=0, constraint_deltas_weight=20, multipliers_lr=0.1,
            init_collision_points=100, reparametrize_trajectory_freq=10,
            optimize_collision_model_freq=1, angle_weight=0.5, angle_offset=0.3,
            boundary_weight=1, collision_multipliers_lr=1e-3,
        ),
    )
    env = TestEnvironmentBuilder().make_car_environment()
    checker = RectangleCollisionChecker((-0.3, 0.2, -0.3, 0.2), (0, 3, 0, 3))
    checker.update_obstacle_points(env.obstacle_points)
    planner = PlannerFactory.make_constrained_onf_planner(checker, params)
    planner.init(env.start_point, env.goal_point, env.bounds)
    t0 = time.time()
    for _ in range(iterations):
        planner.step()
    return planner.get_path(), time.time() - t0


def ours_run(seeds, iterations: int, cpu: bool):
    """Batched solve of all seeds at once; returns (paths [S, 102, 3], secs)."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
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
    keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    init = jax.jit(jax.vmap(
        lambda k: solver.init_state(
            k, jnp.asarray(env.start), jnp.asarray(env.goal),
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
    ))
    states = init(keys)
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (len(seeds),) + (1,) * x.ndim), oracle
    )
    run = jax.jit(jax.vmap(lambda s, o: solver.run(s, o, iterations)))
    t0 = time.time()
    states, _ = jax.block_until_ready(run(states, oracles))
    elapsed = time.time() - t0
    paths = np.asarray(jax.vmap(solver.full_trajectory)(states))
    return paths, elapsed


def evaluate(paths: np.ndarray):
    """Common metric: dense-collision feasibility + xy path length."""
    import jax.numpy as jnp

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
    feasible, lengths = [], []
    for path in paths:
        collides, length = evaluate_path(
            rectangle_collision, oracle, jnp.asarray(path, jnp.float32), 5
        )
        feasible.append(not bool(collides))
        lengths.append(float(length))
    return np.asarray(feasible), np.asarray(lengths)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=5)
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--skip-reference", action="store_true")
    args = parser.parse_args()
    seeds = list(range(args.seeds))

    ours_paths, ours_time = ours_run(seeds, args.iterations, args.cpu)
    ours_feasible, ours_lengths = evaluate(ours_paths)
    print(f"ours:      feasible {ours_feasible.sum()}/{len(seeds)}, "
          f"mean feasible length {ours_lengths[ours_feasible].mean():.4f}, "
          f"wall {ours_time:.1f}s for ALL {len(seeds)} seeds (batched)")

    if args.skip_reference or not pathlib.Path(REFERENCE_PATH).exists():
        print("reference: skipped")
        return 0
    try:
        ref_paths, ref_times = [], []
        for s in seeds:
            path, secs = reference_run(s, args.iterations)
            ref_paths.append(path)
            ref_times.append(secs)
        ref_paths = np.asarray(ref_paths)
    except Exception as exc:  # torch/reference unavailable
        print(f"reference: unavailable ({type(exc).__name__}: {exc})")
        return 0
    ref_feasible, ref_lengths = evaluate(ref_paths)
    print(f"reference: feasible {ref_feasible.sum()}/{len(seeds)}, "
          f"mean feasible length {ref_lengths[ref_feasible].mean():.4f}, "
          f"wall {np.sum(ref_times):.1f}s sequential")

    if ours_feasible.any() and ref_feasible.any():
        ratio = ours_lengths[ours_feasible].mean() / ref_lengths[ref_feasible].mean()
        print(f"cost ratio (ours/reference, path length): {ratio:.4f} "
              f"({(ratio - 1) * 100:+.2f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
