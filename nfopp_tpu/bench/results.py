"""Results serialization in the reference's JSON schema.

The reference writes, per run, a JSON document with environment info, settings,
and `plans[name] = {trajectory, path, stats}` (BenchmarkAdapter.cpp
evaluateAndSaveResult:137-149 via bench-mr's Log::log/save), which the
experiment notebooks then merge and plot. This module reproduces that layout so
the notebook-style analysis carries over.
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Any

import numpy as np

from .metrics import PathStatistics

__all__ = ["ResultsLog", "serialize_trajectory"]


def serialize_trajectory(path: np.ndarray) -> list[list[float]]:
    """[N, 3] -> [[x, y, theta], ...] (Log::serializeTrajectory shape)."""
    return [[float(x), float(y), float(t)] for x, y, t in np.asarray(path)]


class ResultsLog:
    """Accumulates runs, then saves one JSON document per run list."""

    def __init__(self, environment_info: dict[str, Any] | None = None,
                 settings: dict[str, Any] | None = None):
        self.environment_info = environment_info or {}
        self.settings = settings or {}
        self.runs: list[dict] = []

    def log_run(self, name: str, path: np.ndarray, stats: PathStatistics,
                extra: dict | None = None) -> dict:
        entry = {
            "environment": self.environment_info,
            "settings": self.settings,
            "plans": {
                name: {
                    "trajectory": serialize_trajectory(path),
                    "path": serialize_trajectory(path),
                    "stats": stats.as_dict(),
                }
            },
        }
        if extra:
            entry.update(extra)
        self.runs.append(entry)
        return entry

    def save(self, log_file: str | pathlib.Path) -> pathlib.Path:
        """Write `{"runs": [...]}` (+ timestamp) to log_file, mkdir as needed."""
        path = pathlib.Path(log_file)
        path.parent.mkdir(parents=True, exist_ok=True)
        document = {"timestamp": time.time(), "runs": self.runs}
        path.write_text(json.dumps(document, indent=2))
        return path

    @staticmethod
    def load(log_file: str | pathlib.Path) -> dict:
        return json.loads(pathlib.Path(log_file).read_text())
