#!/usr/bin/env python3
"""Holonomic base-planner parity: HolonomicSolver vs the reference NERFOptPlanner.

Every other parity artifact (car scene, corridor, forest, MovingAI, warehouse)
exercises the SE(2) constrained solver; this one compares the BASE planners —
our `nfopp_tpu.solver.HolonomicSolver` against the reference's `NERFOptPlanner`
(/root/reference/neural_field_optimal_planner/nerf_opt_planner.py:60-71) — on
the reference's own holonomic fixture (test/test_nerf_opt_planner.py:14-26):

  * two-walls scene, start (0.5, 0.5) -> goal (2.5, 2.5), bounds (-0.1..3.1)
  * ONF(mean=1.5, sigma=1) — use_cos=False, use_normal_init=False
  * CollisionChecker(r=0.3, bounds (0, 3, 0, 3))
  * Adam 1e-2 on both optimizers (torch defaults: betas (0.9, 0.999))
  * trajectory_random_offset 0.02, collision_weight 0.5,
    velocity_hessian_weight 1, init_collision_iteration 100 (constructor
    defaults, nerf_opt_planner.py:12-14)

Methodology identical to compare_with_reference.py: N seeds each side (RNG
streams differ between frameworks, so comparison is seed-averaged), common
dense evaluation (circle-oracle collision at 5x path resolution + xy length).

NOTE: the two-walls scene is knife-edge for the pure-gradient holonomic
planner (BASELINE_MEASURED.md) — feasibility below 1.0 is expected on BOTH
sides; the parity claim is that rates and feasible costs match.

    python scripts/compare_holonomic.py --seeds 20 --cpu
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_PATH = "/root/reference"


def reference_run(seed: int, iterations: int):
    """One reference NERFOptPlanner solve; returns (path [102, 2], seconds)."""
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    torch.random.manual_seed(seed)
    np.random.seed(seed + 300)
    # the reference test writes CollisionChecker(0.3, (0,3,0,3)) but the base
    # class takes only boundaries (and ignores obstacles!) — the intended
    # class is CircleCollisionChecker (circle_collision_checker.py:6-14);
    # patched here in the driver, never in the reference.
    from neural_field_optimal_planner.collision_checker import CircleCollisionChecker
    from neural_field_optimal_planner.nerf_opt_planner import NERFOptPlanner
    from neural_field_optimal_planner.onf_model import ONF
    from neural_field_optimal_planner.test_environment_builder import (
        TestEnvironmentBuilder,
    )

    torch.autograd.set_detect_anomaly(False)

    env = TestEnvironmentBuilder.make_test_environment()
    collision_model = ONF(1.5, 1)
    collision_checker = CircleCollisionChecker(0.3, (0, 3, 0, 3))
    collision_checker.update_obstacle_points(env.obstacle_points)
    collision_optimizer = torch.optim.Adam(collision_model.parameters(), 1e-2)
    trajectory = torch.zeros(100, 2, requires_grad=True)
    trajectory_optimizer = torch.optim.Adam([trajectory], 1e-2)
    planner = NERFOptPlanner(
        trajectory, collision_model, collision_checker,
        collision_optimizer, trajectory_optimizer, 0.02, 0.5, 1,
    )
    planner.init(env.start_point, env.goal_point, env.bounds)
    t0 = time.time()
    for _ in range(iterations):
        planner.step()
    return planner.get_path(), time.time() - t0


def holonomic_config():
    from nfopp_tpu.models import ONFConfig
    from nfopp_tpu.solver import SolverConfig

    return SolverConfig(
        onf=ONFConfig(
            mean=1.5, sigma=1.0, use_cos=False, use_normal_init=False,
            angle_encoding=False,
        ),
        collision_lr=1e-2,
        collision_betas=(0.9, 0.999),
        trajectory_lr=1e-2,
        trajectory_betas=(0.9, 0.999),
        trajectory_random_offset=0.02,
        collision_weight=0.5,
        velocity_hessian_weight=1.0,
        init_collision_iteration=100,
    )


def ours_run(seeds, iterations: int, cpu: bool):
    """Batched solve of all seeds at once; returns (paths [S, 102, 2], secs)."""
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nfopp_tpu.solver import HolonomicSolver
    from nfopp_tpu.worlds import circle_collision, two_walls_environment

    env = two_walls_environment()
    oracle = make_oracle()
    solver = HolonomicSolver(holonomic_config(), circle_collision)
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
    # compile ahead of the timed call so wall_s_batched measures the solve,
    # not XLA compilation (the reference side times only its step loop)
    compiled = run.lower(states, oracles).compile()
    t0 = time.time()
    final_states, _ = jax.block_until_ready(compiled(states, oracles))
    elapsed = time.time() - t0
    paths = np.asarray(jax.vmap(solver.full_trajectory)(final_states))

    # Production mode: full budget + device-side best-feasible-path tracking
    # (run_bench_mr.py semantics, stop_on_plateau=False — the measured-better
    # default). Same iteration budget; reported alongside the final-iterate
    # number, which is the methodology-matched parity row.
    from functools import partial

    from nfopp_tpu.solver.tracking import run_with_tracking

    track = jax.jit(jax.vmap(
        partial(run_with_tracking, solver),
        in_axes=(0, 0, None, None, None, None, None),
    ), static_argnums=(2, 3, 4, 5, 6))
    result = track(states, oracles, iterations, 200, 50, 5, False)
    tracked_paths = np.asarray(result.path)
    tracked_feasible = np.asarray(result.feasible)

    # Restart fallback (bench/runner.py restart_failed semantics): re-solve
    # still-infeasible seeds with fresh streams at the same budget. The
    # production framework's answer to knife-edge scenes — MovingAI went
    # 7/10 -> 10/10 this way (BASELINE_MEASURED.md).
    restart_paths = tracked_paths.copy()
    restart_feasible = tracked_feasible.copy()
    restarts_used = np.zeros(len(seeds), np.int32)
    for r in range(1, 5):
        if restart_feasible.all():
            break
        idx = np.flatnonzero(~restart_feasible)
        ks = jnp.stack([jax.random.PRNGKey(int(s) + 1000 * r) for s in idx])
        sub = init(ks)
        sub_oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (len(idx),) + (1,) * x.ndim), oracle
        )
        res = track(sub, sub_oracles, iterations, 200, 50, 5, False)
        ok = np.asarray(res.feasible)
        restart_paths[idx[ok]] = np.asarray(res.path)[ok]
        restart_feasible[idx[ok]] = True
        restarts_used[idx] = r
    return (paths, elapsed, tracked_paths, tracked_feasible,
            restart_paths, restart_feasible, restarts_used)


def make_oracle():
    import jax.numpy as jnp

    from nfopp_tpu.worlds import CircleOracle, pad_obstacle_points, two_walls_environment

    env = two_walls_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    return CircleOracle(
        points=jnp.asarray(pts),
        mask=jnp.asarray(mask),
        radius=jnp.float32(0.3),
        bounds=jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )


def evaluate(paths: np.ndarray):
    """Common metric: dense-collision feasibility + xy path length."""
    import jax.numpy as jnp

    from nfopp_tpu.solver.tracking import evaluate_path
    from nfopp_tpu.worlds import circle_collision

    oracle = make_oracle()
    feasible, lengths = [], []
    for path in paths:
        collides, length = evaluate_path(
            circle_collision, oracle, jnp.asarray(path, jnp.float32), 5
        )
        feasible.append(not bool(collides))
        lengths.append(float(length))
    return np.asarray(feasible), np.asarray(lengths)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=20)
    parser.add_argument("--iterations", type=int, default=1000)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--skip-reference", action="store_true")
    parser.add_argument("--out", type=str, default=None,
                        help="write a JSON artifact here")
    args = parser.parse_args()
    seeds = list(range(args.seeds))

    (ours_paths, ours_time, tracked_paths, _, restart_paths,
     restart_feasible, restarts_used) = ours_run(seeds, args.iterations, args.cpu)
    ours_feasible, ours_lengths = evaluate(ours_paths)
    ours_mean = float(ours_lengths[ours_feasible].mean()) if ours_feasible.any() else None
    print(f"ours:      feasible {ours_feasible.sum()}/{len(seeds)}, "
          f"mean feasible length {ours_mean}, "
          f"wall {ours_time:.1f}s for ALL {len(seeds)} seeds (batched)")
    trk_feasible, trk_lengths = evaluate(tracked_paths)
    trk_mean = float(trk_lengths[trk_feasible].mean()) if trk_feasible.any() else None
    print(f"ours+trk:  feasible {trk_feasible.sum()}/{len(seeds)}, "
          f"mean feasible length {trk_mean} "
          f"(full budget + best-feasible tracking, production mode)")
    rst_feasible, rst_lengths = evaluate(restart_paths)
    rst_mean = float(rst_lengths[rst_feasible].mean()) if rst_feasible.any() else None
    print(f"ours+rst:  feasible {rst_feasible.sum()}/{len(seeds)}, "
          f"mean feasible length {rst_mean} "
          f"(+ up to 4 fresh-stream restarts of infeasible seeds)")

    result = {
        "fixture": "two_walls holonomic (test_nerf_opt_planner.py setUp)",
        "iterations": args.iterations,
        "seeds": len(seeds),
        "ours": {
            "feasible": int(ours_feasible.sum()),
            "mean_feasible_length": ours_mean,
            "wall_s_batched": round(ours_time, 2),
        },
        "ours_tracked": {
            "feasible": int(trk_feasible.sum()),
            "mean_feasible_length": trk_mean,
        },
        "ours_restarts": {
            "feasible": int(rst_feasible.sum()),
            "mean_feasible_length": rst_mean,
            "max_restarts": 4,
            # per-seed count of fresh-stream restarts attempted (0 = first
            # try was feasible; a seed's last attempt may still have failed)
            "restarts_used": restarts_used.tolist(),
        },
    }

    ref_available = not args.skip_reference and pathlib.Path(REFERENCE_PATH).exists()
    if ref_available:
        try:
            ref_paths, ref_times = [], []
            for s in seeds:
                path, secs = reference_run(s, args.iterations)
                ref_paths.append(path)
                ref_times.append(secs)
                print(f"  reference seed {s}: {secs:.1f}s", flush=True)
            ref_paths = np.asarray(ref_paths)
        except Exception as exc:
            print(f"reference: unavailable ({type(exc).__name__}: {exc})")
            ref_available = False
    if ref_available:
        ref_feasible, ref_lengths = evaluate(ref_paths)
        ref_mean = float(ref_lengths[ref_feasible].mean()) if ref_feasible.any() else None
        print(f"reference: feasible {ref_feasible.sum()}/{len(seeds)}, "
              f"mean feasible length {ref_mean}, "
              f"wall {np.sum(ref_times):.1f}s sequential")
        result["reference"] = {
            "feasible": int(ref_feasible.sum()),
            "mean_feasible_length": ref_mean,
            "wall_s_sequential": round(float(np.sum(ref_times)), 2),
        }
        if ours_feasible.any() and ref_feasible.any():
            ratio = ours_mean / ref_mean
            print(f"cost ratio (ours/reference, path length): {ratio:.4f} "
                  f"({(ratio - 1) * 100:+.2f}%)")
            result["cost_ratio"] = round(ratio, 4)
        if trk_feasible.any() and ref_feasible.any():
            ratio = trk_mean / ref_mean
            print(f"cost ratio (ours+tracking/reference): {ratio:.4f} "
                  f"({(ratio - 1) * 100:+.2f}%)")
            result["cost_ratio_tracked"] = round(ratio, 4)
    else:
        print("reference: skipped")

    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(result, indent=2) + "\n")
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
