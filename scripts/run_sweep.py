#!/usr/bin/env python3
"""Hyperparameter sweep over benchmark suites — the reference's
run_bench_mr_configured.py capability (it sweeps sigma and collision_weight
via a counter file, :19-23,69-80), TPU-batched: every (config, seed) cell
still solves a full seed batch at once.

    python scripts/run_sweep.py --suite corridor --seeds 4 \
        --sigmas 2.5,5,10 --collision-weights 50,100,200
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--suite", choices=["corridor", "forest"], default="corridor")
    parser.add_argument("--seeds", type=int, default=4)
    parser.add_argument("--sigmas", default="2.5,5,10")
    parser.add_argument("--collision-weights", default="50,100,200")
    parser.add_argument("--max-iterations", type=int, default=1000)
    parser.add_argument("--footprint-radius", type=float, default=1.0)
    parser.add_argument("--out", default="/tmp/nfopp_sweep.json")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()  # TPU-only (backend-checked)

    from nfopp_tpu.bench.runner import run_grid_suite
    from nfopp_tpu.utils import Config
    from nfopp_tpu.worlds import corridor, random_forest

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from run_benchmark import bench_parameters

    make = corridor if args.suite == "corridor" else (
        lambda seed: random_forest(seed=seed)
    )
    scenarios = [make(seed=s) for s in range(args.seeds)]

    sigmas = [float(x) for x in args.sigmas.split(",")]
    weights = [float(x) for x in args.collision_weights.split(",")]
    rows = []
    print(f"{'sigma':>7} {'c_weight':>9} {'feasible':>9} {'mean_len':>9} {'wall_s':>7}")
    for sigma in sigmas:
        for weight in weights:
            params = Config.from_dict(bench_parameters()).update(
                {
                    "collision_model": {"sigma": sigma},
                    "planner": {"collision_weight": weight},
                }
            ).as_attribute_dict()
            result = run_grid_suite(
                scenarios, params,
                footprint_radius=args.footprint_radius,
                max_iterations=args.max_iterations,
            )
            feasible = result.feasible
            mean_len = (
                float(result.lengths[feasible].mean()) if feasible.any() else float("nan")
            )
            rows.append(
                {
                    "sigma": sigma,
                    "collision_weight": weight,
                    "feasible": int(feasible.sum()),
                    "total": len(feasible),
                    "mean_feasible_length": mean_len,
                    "wall_s": result.wall_time,
                }
            )
            print(f"{sigma:>7} {weight:>9} {int(feasible.sum()):>4}/{len(feasible):<4} "
                  f"{mean_len:>9.2f} {result.wall_time:>7.1f}")
    pathlib.Path(args.out).write_text(json.dumps(rows, indent=2))
    print(f"sweep saved to {args.out}")


if __name__ == "__main__":
    main()
