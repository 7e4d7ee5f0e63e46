#!/usr/bin/env python3
"""Analyze benchmark result JSONs — the reference's notebook analysis flow
(merge pooled runs, per-planner stat plots, trajectory galleries;
corridor_experiment.ipynb cells 5-7) as a CLI.

    # aggregate table over one or more result files
    python scripts/analyze_results.py results_a.json results_b.json

    # merge into one document (bench-mr MultipleMPB.merge)
    python scripts/analyze_results.py a.json b.json --merge merged.json

    # per-metric box plots per planner (plot_planner_stats)
    python scripts/analyze_results.py merged.json --plot stats.png

    # trajectory gallery over the occupancy grids (visualize_trajectories)
    python scripts/analyze_results.py merged.json --trajectories traj.png
"""
from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("files", nargs="+", help="results JSON files")
    parser.add_argument("--merge", help="write merged document here")
    parser.add_argument("--plot", help="write per-metric stat panels (png/pdf)")
    parser.add_argument("--trajectories", help="write trajectory gallery (png/pdf)")
    parser.add_argument("--planner", help="restrict trajectory gallery to one planner")
    parser.add_argument("--max-runs", type=int, help="limit gallery size")
    parser.add_argument("--metrics", help="comma-separated metric list override")
    parser.add_argument("--sweep-panel", help="treat FILES[0] as a "
                        "run_sweep.py row list and write sigma x "
                        "collision_weight heatmaps here (png/pdf)")
    args = parser.parse_args()

    from nfopp_tpu.bench import analysis

    if args.sweep_panel:
        import json

        rows = json.loads(pathlib.Path(args.files[0]).read_text())
        out = analysis.plot_sweep(
            rows, args.sweep_panel,
            title=pathlib.Path(args.files[0]).stem,
        )
        print(f"sweep panel -> {out}")
        return 0

    doc = analysis.load_results(args.files)
    metrics = args.metrics.split(",") if args.metrics else None

    if args.merge:
        out = analysis.merge_results(args.files, args.merge)
        print(f"merged {len(args.files)} file(s), {len(doc['runs'])} runs -> {out}")

    aggregated = analysis.aggregate_stats(doc, metrics)
    print(analysis.format_stats_table(aggregated, metrics))

    if args.plot:
        out = analysis.plot_planner_stats(doc, args.plot, metrics)
        print(f"stat panels -> {out}")
    if args.trajectories:
        out = analysis.plot_trajectories(
            doc, args.trajectories, max_runs=args.max_runs, planner=args.planner
        )
        print(f"trajectory gallery -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
