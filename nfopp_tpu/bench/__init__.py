"""Benchmark evaluation: path-quality metrics (native C++ + numpy), results
schema, suite runner, experiment analysis."""

from .adapter import BenchmarkAdapter, BenchmarkCollisionChecker  # noqa: F401
from .metrics import PathStatistics, path_statistics, path_stats_numpy  # noqa: F401
from .results import (  # noqa: F401
    ResultsLog,
    decode_grid_rle,
    encode_grid_rle,
    grid_environment_info,
    serialize_trajectory,
)
from . import analysis, native_binding  # noqa: F401
