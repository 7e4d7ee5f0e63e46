"""ctypes binding for the native path-statistics evaluator.

Loads nfopp_tpu/bench/native/libpath_stats.so, building it on first use if a
compiler is available. `available()` gates tests/callers; the numpy
implementation in `metrics.py` is the drop-in fallback.
"""
from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

__all__ = [
    "available",
    "path_stats_native",
    "path_stats_batch_native",
    "path_clearance_segments_native",
]

_NATIVE_DIR = pathlib.Path(__file__).parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpath_stats.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    # always run make: a no-op when the .so is newer than path_stats.cpp,
    # a rebuild when a stale library predates newly added entry points
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        if not _LIB_PATH.exists():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        dp = ctypes.POINTER(ctypes.c_double)
        lib.nfopp_path_stats.argtypes = [
            dp, ctypes.c_int64, dp, ctypes.c_int64, ctypes.c_double,
            ctypes.c_double, dp,
        ]
        lib.nfopp_path_stats_batch.argtypes = [
            dp, ctypes.c_int64, ctypes.c_int64, dp, ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, dp,
        ]
        lib.nfopp_path_clearance_segments.argtypes = [
            dp, ctypes.c_int64, dp, ctypes.c_int64, dp,
        ]
    except (OSError, AttributeError):
        _build_failed = True
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def path_stats_native(
    path: np.ndarray,
    obstacles: np.ndarray | None = None,
    angular_weight: float = 1.0,
    cusp_threshold: float = np.pi / 2,
) -> np.ndarray:
    """[N, 3] path -> raw [12] stats vector (see path_stats.cpp header)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library unavailable")
    path = np.ascontiguousarray(path, np.float64)
    out = np.zeros(12, np.float64)
    if obstacles is not None and len(obstacles):
        obstacles = np.ascontiguousarray(obstacles, np.float64)
        obs_ptr, m = _as_c(obstacles), len(obstacles)
    else:
        obs_ptr, m = None, 0
    lib.nfopp_path_stats(
        _as_c(path), len(path), obs_ptr, m, angular_weight, cusp_threshold, _as_c(out)
    )
    return out


def path_clearance_segments_native(
    path: np.ndarray, segments: np.ndarray
) -> np.ndarray:
    """[N, 3] path, [S, 4] segment rows (x0, y0, x1, y1) -> [4] clearance
    stats (mean, median, min, max) measured EXACTLY against the segments."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library unavailable")
    path = np.ascontiguousarray(path, np.float64)
    segments = np.ascontiguousarray(segments, np.float64)
    out = np.zeros(4, np.float64)
    lib.nfopp_path_clearance_segments(
        _as_c(path), len(path), _as_c(segments), len(segments), _as_c(out)
    )
    return out


def path_stats_batch_native(
    paths: np.ndarray,
    obstacles: np.ndarray | None = None,
    angular_weight: float = 1.0,
    cusp_threshold: float = np.pi / 2,
) -> np.ndarray:
    """[B, N, 3] paths -> [B, 12] stats."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native metrics library unavailable")
    paths = np.ascontiguousarray(paths, np.float64)
    batch, n, _ = paths.shape
    out = np.zeros((batch, 12), np.float64)
    if obstacles is not None and len(obstacles):
        obstacles = np.ascontiguousarray(obstacles, np.float64)
        obs_ptr, m = _as_c(obstacles), len(obstacles)
    else:
        obs_ptr, m = None, 0
    lib.nfopp_path_stats_batch(
        _as_c(paths), batch, n, obs_ptr, m, angular_weight, cusp_threshold, _as_c(out)
    )
    return out
