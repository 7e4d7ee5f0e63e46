"""Experiment-analysis tooling: RLE codec, merge, aggregation, plots.

Covers the notebook-replacement flow (SURVEY.md §4 'experiment-level
validation'): build two small result documents, merge them, aggregate the
per-planner stats, and render both figures.
"""
import json

import numpy as np
import pytest

from nfopp_tpu.bench import analysis
from nfopp_tpu.bench.metrics import PathStatistics
from nfopp_tpu.bench.results import (
    ResultsLog,
    decode_grid_rle,
    encode_grid_rle,
    grid_environment_info,
)


def make_doc(tmp_path, name, planner, lengths, collides_flags):
    rng = np.random.RandomState(0)
    blocked = rng.rand(12, 12) > 0.8
    log = ResultsLog(settings={"nfomp": {"trajectory_length": 10}})
    for i, (length, collides) in enumerate(zip(lengths, collides_flags)):
        path = np.stack(
            [np.linspace(0, length / np.sqrt(2), 11),
             np.linspace(0, length / np.sqrt(2), 11),
             np.zeros(11)], axis=1)
        stats = PathStatistics(
            planner=planner, path_found=not collides, path_collides=collides,
            planning_time=0.5 + 0.1 * i, path_length=length,
            max_curvature=0.3, normalized_curvature=1.1, aol=0.2,
            smoothness=0.05, mean_clearing_distance=2.0, cusps=0,
        )
        log.log_run(
            planner, path, stats, extra={"seed_index": i},
            environment=grid_environment_info(
                blocked, 1.0, (0.0, 0.0), path[0], path[-1]),
        )
    out = tmp_path / name
    log.save(out)
    return out


class TestGridRLE:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_roundtrip(self, seed):
        rng = np.random.RandomState(seed)
        grid = rng.rand(17, 23) > 0.7
        assert (decode_grid_rle(encode_grid_rle(grid)) == grid).all()

    def test_all_free_and_all_occupied(self):
        free = np.zeros((4, 4), bool)
        occ = np.ones((4, 4), bool)
        assert (decode_grid_rle(encode_grid_rle(free)) == free).all()
        assert (decode_grid_rle(encode_grid_rle(occ)) == occ).all()

    def test_compactness(self):
        """Corridor-like grid should RLE far below one number per cell."""
        grid = np.zeros((100, 100), bool)
        grid[40:60, :] = True
        enc = encode_grid_rle(grid)
        assert len(enc["runs"]) < 100


class TestAnalysis:
    def test_merge_and_aggregate(self, tmp_path):
        a = make_doc(tmp_path, "a.json", "nfopp_tpu", [10.0, 12.0], [False, False])
        b = make_doc(tmp_path, "b.json", "gpmp2", [11.0, 15.0], [False, True])
        merged = analysis.merge_results([a, b], tmp_path / "merged.json")
        doc = json.loads(merged.read_text())
        assert len(doc["runs"]) == 4

        agg = analysis.aggregate_stats(doc)
        assert set(agg) == {"nfopp_tpu", "gpmp2"}
        assert agg["nfopp_tpu"]["path_length"]["mean"] == pytest.approx(11.0)
        assert agg["gpmp2"]["path_found"]["mean"] == pytest.approx(0.5)

        table = analysis.format_stats_table(agg)
        assert "nfopp_tpu" in table and "path_length" in table
        assert "found: 50%" in table

    def test_plots_render(self, tmp_path):
        a = make_doc(tmp_path, "a.json", "nfopp_tpu", [10.0, 12.0, 9.5], [False] * 3)
        b = make_doc(tmp_path, "b.json", "gpmp2", [11.0, 15.0, 13.0], [False, True, False])
        doc = analysis.load_results([a, b])
        stats_png = analysis.plot_planner_stats(doc, tmp_path / "stats.png")
        traj_png = analysis.plot_trajectories(doc, tmp_path / "traj.png", max_runs=4)
        assert stats_png.stat().st_size > 1000
        assert traj_png.stat().st_size > 1000

    def test_empty_document_raises(self, tmp_path):
        with pytest.raises(ValueError):
            analysis.plot_trajectories({"runs": []}, tmp_path / "x.png")


class TestSweepPanel:
    def test_renders_grid(self, tmp_path):
        rows = [
            {"sigma": s, "collision_weight": w, "feasible": f, "total": 10,
             "mean_feasible_length": ln, "wall_s": 1.0}
            for (s, w, f, ln) in [
                (2.5, 50.0, 10, 34.7), (2.5, 100.0, 9, 34.6),
                (5.0, 50.0, 10, 34.5), (5.0, 100.0, 10, 34.8),
            ]
        ]
        out = analysis.plot_sweep(rows, tmp_path / "sweep.png", title="t")
        assert out.stat().st_size > 1000

    def test_handles_nan_length_cell(self, tmp_path):
        rows = [
            {"sigma": 2.5, "collision_weight": 50.0, "feasible": 0, "total": 4,
             "mean_feasible_length": float("nan"), "wall_s": 1.0},
            {"sigma": 5.0, "collision_weight": 50.0, "feasible": 4, "total": 4,
             "mean_feasible_length": 30.0, "wall_s": 1.0},
        ]
        out = analysis.plot_sweep(rows, tmp_path / "sweep2.png")
        assert out.stat().st_size > 1000
