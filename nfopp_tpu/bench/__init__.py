"""Benchmark evaluation: path-quality metrics (native C++ + numpy), results
schema, suite runner."""

from .adapter import BenchmarkAdapter, BenchmarkCollisionChecker  # noqa: F401
from .metrics import PathStatistics, path_statistics, path_stats_numpy  # noqa: F401
from .results import ResultsLog, serialize_trajectory  # noqa: F401
from . import native_binding  # noqa: F401
