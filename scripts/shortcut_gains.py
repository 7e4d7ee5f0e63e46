#!/usr/bin/env python3
"""Reproducible shortcut-gains artifact (artifacts/shortcut_gains.json).

For each world class: run the full-budget suite ONCE (the parity worlds —
same generators/endpoints as compare_suites), then apply the random-pair
shortcut pass to the SAME solved paths and measure the length gain and the
repair count under the current accounting (bench/runner.py::_shortcut_pass:
a chord whose dense re-check passes is taken, and taken-over-infeasible
counts as `repaired`). Reference ratios come from the committed parity
artifacts (the reference never simplifies — get_path returns the raw
iterate; bench-mr's OMPL PathSimplifier is unused by it).

    python scripts/shortcut_gains.py --out artifacts/shortcut_gains.json
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

TRIALS = 128

SUITES = {
    # suite -> (seeds, min_geodesic, iterations, parity artifact w/ ref lengths)
    "corridor": (10, 160.0, 1000, "artifacts/parity_corridor.json"),
    "forest": (20, 80.0, 1000, "artifacts/parity_forest.json"),
    "warehouse": (10, 0.0, 1000, "artifacts/parity_warehouse_fullbudget.json"),
    "movingai": (10, 0.0, 3000, "artifacts/parity_movingai_fullbudget.json"),
}

# ref-side feasibility for parity artifacts that predate the
# ref_feasible_mask field: corridor was 10/10; forest's reference failed
# seeds 0, 4, 17 (recorded in the round-3 shortcut_gains artifact and
# BASELINE_MEASURED.md)
REF_FAIL_SEEDS = {"corridor": [], "forest": [0, 4, 17]}


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="artifacts/shortcut_gains.json")
    parser.add_argument("--suites", default="corridor,forest,warehouse,movingai")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--smoke", action="store_true",
                        help="mechanics check: 100-iteration solves "
                             "(ratios are meaningless, artifact not for "
                             "committing)")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from nfopp_tpu.utils import enable_tpu_compile_cache

    enable_tpu_compile_cache()

    import jax.numpy as jnp

    from compare_suites import FOOTPRINT_RADIUS, build_scenarios, suite_parameters

    from nfopp_tpu.bench.runner import _shortcut_pass, run_grid_suite
    from nfopp_tpu.solver import ConstrainedSolver, config_from_parameters
    from nfopp_tpu.worlds.oracle import grid_collision

    root = pathlib.Path(__file__).resolve().parent.parent
    out = {
        "postprocess": f"ops/shortcut.py random-pair shortcutting, {TRIALS} "
                       "trials/path, dense 5-sample check",
        "note": "same worlds as the parity_*_fullbudget artifacts; the "
                "shortcut pass is applied to the SAME solved paths (one "
                "suite solve, then the pass) under the current repair "
                "accounting: a chord whose dense re-check passes is taken, "
                "take-over-infeasible is counted in repaired_by_shortcut. "
                "The reference never simplifies (get_path returns the raw "
                "iterate; bench-mr's OMPL PathSimplifier unused by it).",
        "trials": TRIALS,
    }
    for suite in args.suites.split(","):
        seeds, min_geo, iters, parity_file = SUITES[suite]
        if args.smoke:
            iters = 100
        t0 = time.time()
        scenarios = build_scenarios(suite, seeds, min_geo)
        parameters = suite_parameters(suite)
        result = run_grid_suite(
            scenarios, parameters, footprint_radius=FOOTPRINT_RADIUS,
            max_iterations=iters, min_iterations=200, check_freq=50,
            stop_on_plateau=False,
        )
        config = config_from_parameters(parameters)
        solver = ConstrainedSolver(config, grid_collision)
        oracles = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs),
            *[s.oracle(FOOTPRINT_RADIUS) for s in scenarios],
        )
        paths_s, lengths_s, feasible_s, repaired = _shortcut_pass(
            solver, oracles, result.paths, result.lengths, result.feasible,
            jax.random.PRNGKey(0x5C0C), TRIALS,
        )
        wall = time.time() - t0
        raw_feas = result.feasible
        row = {
            "seeds": seeds,
            "iterations": iters,
            "feasible_raw": int(raw_feas.sum()),
            "feasible_after_shortcut": int(feasible_s.sum()),
            "repaired_by_shortcut": int(repaired),
            "mean_raw_feasible": float(result.lengths[raw_feas].mean()),
            "mean_shortcut_same_set": float(lengths_s[raw_feas].mean()),
            "gain_pct_feasible": round(float(
                (1 - lengths_s[raw_feas].mean() / result.lengths[raw_feas].mean())
                * 100
            ), 3),
            "wall_s": round(wall, 1),
        }
        parity_path = root / parity_file
        if parity_path.exists():
            parity = json.loads(parity_path.read_text())
            ref_lengths = parity.get("ref_lengths")
            ref_mask = parity.get("ref_feasible_mask")
            if ref_mask is None and suite in REF_FAIL_SEEDS:
                ref_mask = [s not in REF_FAIL_SEEDS[suite] for s in range(seeds)]
            if ref_lengths is not None and ref_mask is not None:
                both = np.asarray(ref_mask, bool) & feasible_s
                ref_arr = np.asarray(
                    [np.nan if x is None else x for x in ref_lengths]
                )
                if both.any():
                    row["both_feasible"] = int(both.sum())
                    row["vs_reference_ratio_both_feasible"] = round(float(
                        lengths_s[both].mean() / ref_arr[both].mean()
                    ), 4)
                    row["ref_parity_artifact"] = parity_file
        out[suite] = row
        print(json.dumps({suite: row}), file=sys.stderr, flush=True)
    text = json.dumps(out, indent=2)
    pathlib.Path(args.out).write_text(text + "\n")
    print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
