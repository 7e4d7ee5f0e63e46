"""Benchmark evaluation: path-quality metrics (native C++ + numpy), results
schema, suite runner, experiment analysis."""

from .adapter import BenchmarkAdapter, BenchmarkCollisionChecker  # noqa: F401
from .metrics import (  # noqa: F401
    PathStatistics,
    active_evaluator,
    path_statistics,
    path_stats_numpy,
    polygons_to_segments,
    segment_clearance_numpy,
)
from .results import (  # noqa: F401
    ResultsLog,
    decode_grid_rle,
    encode_grid_rle,
    grid_environment_info,
    serialize_trajectory,
)
from . import analysis, native_binding  # noqa: F401
