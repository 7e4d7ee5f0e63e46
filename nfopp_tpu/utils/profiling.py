"""TPU profiling helpers: jax.profiler traces + per-phase device timing.

The reference instruments its hot loop with a host-side tick/tock timer
(utils/timer.py); under jit that only measures dispatch. These helpers measure
what actually matters on TPU: traced profiles (open in XProf/TensorBoard) and
blocked wall-clock of compiled functions.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax

__all__ = ["trace", "timed_call", "steps_per_second"]


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/nfopp_profile"):
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_call(fn: Callable, *args, warmup: int = 1, iters: int = 5) -> tuple[float, Any]:
    """(median seconds per call, last result) with block_until_ready."""
    result = None
    for _ in range(warmup):
        result = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        result = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], result


def steps_per_second(step_fn: Callable, state, *args, steps: int = 100) -> float:
    """Throughput of a scanned/jitted step function."""
    seconds, _ = timed_call(lambda: step_fn(state, *args), warmup=1, iters=3)
    return steps / seconds
