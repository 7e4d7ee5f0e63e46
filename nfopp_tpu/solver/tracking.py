"""Benchmark-mode solve loop: periodic path evaluation, best-path tracking,
early stop — device-side.

Reproduces the control flow of `scripts/run_bench_mr.py:111-133`: step the
planner up to `max_iterations`; every `check_freq` iterations past
`min_iterations` evaluate the path against the ground-truth oracle; remember
the shortest feasible path; stop at the first feasible path that no longer
improves; finally return the current path unless it collides and a feasible
best exists.

The reference breaks out of a Python loop; here a `lax.while_loop` over
`check_freq`-step scanned chunks stops genuinely early (under vmap it runs
until every problem in the shard is done). Path evaluation replaces the C++
OMPL interpolated validity check (BenchmarkAdapter.cpp:201-208) with
fixed-count segment sampling on device.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.math import dense_path

__all__ = [
    "TrackingCarry",
    "TrackingResult",
    "evaluate_path",
    "run_with_tracking",
    "run_grouped_with_tracking",
    "run_tracking_segment",
    "tracking_finalize",
    "tracking_init",
]


class TrackingResult(NamedTuple):
    state: Any  # final solver state
    path: jnp.ndarray  # [N+2, d] returned path (best-feasible fallback applied)
    length: jnp.ndarray  # xy length of `path`
    feasible: jnp.ndarray  # bool: `path` is collision-free
    iterations: jnp.ndarray  # int32: solver steps actually taken


class TrackingCarry(NamedTuple):
    """Mid-solve tracking state — the checkpointable unit of a benchmark
    solve. `run_with_tracking` = tracking_init -> run_tracking_segment(all
    chunks) -> tracking_finalize; resumable solves run the segments one at a
    time and serialize the carry between them (solver/checkpoint.py)."""

    state: Any  # solver state
    best_path: jnp.ndarray
    best_length: jnp.ndarray
    done: jnp.ndarray
    iterations: jnp.ndarray
    chunk: jnp.ndarray  # int32: chunks completed so far


# shared with ops/shortcut.py so the evaluator and the shortcut accept-check
# can never drift apart
_dense_path = dense_path


def evaluate_path(
    oracle_fn,
    oracle_params: Any,
    full_path: jnp.ndarray,
    samples_per_segment: int = 5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(collides, xy_length) of a path, like the reference's evaluatePath
    (BenchmarkAdapter.cpp:201-208): interpolate, validity-check, measure."""
    dense = _dense_path(full_path, samples_per_segment)
    collides = jnp.any(oracle_fn(oracle_params, dense))
    seg = full_path[1:, :2] - full_path[:-1, :2]
    length = jnp.sum(jnp.sqrt(jnp.sum(seg * seg, axis=-1)))
    return collides, length


def run_with_tracking(
    solver,
    state: Any,
    oracle_params: Any,
    max_iterations: int = 1000,
    min_iterations: int = 200,
    check_freq: int = 50,
    samples_per_segment: int = 5,
    stop_on_plateau: bool = True,
) -> TrackingResult:
    """Benchmark solve loop for one problem (vmap for a batch).

    max_iterations is rounded up to a whole number of check_freq chunks.

    stop_on_plateau=True reproduces the reference's break-on-first-
    non-improving-feasible-check (run_bench_mr.py:119-127) — a CPU-era
    economy: every extra iteration costs ~8 ms there. On TPU the budget is
    already paid for (the batch finishes with its slowest problem), so
    stop_on_plateau=False keeps refining to max_iterations and returns the
    best feasible path seen — measured −1.1 % path cost on the 20-seed forest
    suite at identical iteration budget (BASELINE_MEASURED.md).
    """
    num_chunks = -(-max_iterations // check_freq)
    carry = tracking_init(solver, state)
    carry = run_tracking_segment(
        solver, carry, oracle_params, num_chunks, min_iterations, check_freq,
        samples_per_segment, stop_on_plateau,
    )
    return tracking_finalize(solver, carry, oracle_params, samples_per_segment,
                             stop_on_plateau)


def tracking_init(solver, state: Any) -> TrackingCarry:
    """Fresh carry at chunk 0 (pre-solve)."""
    return TrackingCarry(
        state=state,
        best_path=solver.full_trajectory(state),
        best_length=jnp.asarray(jnp.inf, jnp.float32),
        done=jnp.asarray(False),
        iterations=jnp.zeros((), jnp.int32),
        chunk=jnp.zeros((), jnp.int32),
    )


def run_tracking_segment(
    solver,
    carry: TrackingCarry,
    oracle_params: Any,
    end_chunk: int,
    min_iterations: int = 200,
    check_freq: int = 50,
    samples_per_segment: int = 5,
    stop_on_plateau: bool = True,
) -> TrackingCarry:
    """Advance the tracked solve until `end_chunk` chunks are complete (or the
    problem early-stops). Chaining segments is numerically identical to one
    segment covering the whole range — the while_loop body is the same
    program either way."""

    def chunk_body(carry):
        state, best_path, best_length, done, iterations, chunk = carry
        stepped, _ = solver.run(state, oracle_params, check_freq)
        # Under vmap, while_loop keeps executing the body for lanes whose cond
        # is already false — freeze finished problems so their result is the
        # state at their own stopping point, matching the reference's `break`.
        new_state = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), state, stepped
        )
        iterations = jnp.where(done, iterations, iterations + check_freq)
        path = solver.full_trajectory(new_state)
        collides, length = evaluate_path(
            solver.oracle_fn, oracle_params, path, samples_per_segment
        )
        check_active = (~done) & (iterations > min_iterations)
        feasible = check_active & ~collides
        improves = feasible & (length < best_length)
        best_path = jnp.where(improves, path, best_path)
        best_length = jnp.where(improves, length, best_length)
        # Reference semantics: first feasible-but-not-improving check -> stop.
        if stop_on_plateau:
            done = done | (feasible & ~improves)
        return TrackingCarry(
            new_state, best_path, best_length, done, iterations, chunk + 1
        )

    def cond(carry):
        return (~carry.done) & (carry.chunk < end_chunk)

    return jax.lax.while_loop(cond, chunk_body, carry)


def tracking_finalize(
    solver,
    carry: TrackingCarry,
    oracle_params: Any,
    samples_per_segment: int = 5,
    stop_on_plateau: bool = True,
) -> TrackingResult:
    """Final-path selection (run_bench_mr.py:128-133 semantics)."""
    state, best_path, best_length, iterations = (
        carry.state, carry.best_path, carry.best_length, carry.iterations
    )
    final_path = solver.full_trajectory(state)
    final_collides, final_length = evaluate_path(
        solver.oracle_fn, oracle_params, final_path, samples_per_segment
    )
    has_best = jnp.isfinite(best_length)
    if stop_on_plateau:
        # reference return: final path unless it collides (run_bench_mr.py:128-133)
        use_best = final_collides & has_best
    else:
        # full-budget mode: the final iterate can oscillate above the tracked
        # best — return whichever feasible path is shorter
        use_best = has_best & (final_collides | (best_length < final_length))
    path = jnp.where(use_best, best_path, final_path)
    length = jnp.where(use_best, best_length, final_length)
    feasible = ~final_collides | has_best
    return TrackingResult(
        state=state, path=path, length=length, feasible=feasible, iterations=iterations
    )


def run_grouped_with_tracking(
    solver,
    states: Any,
    oracle_params: Any,
    group_size: int,
    max_iterations: int = 1000,
    min_iterations: int = 200,
    check_freq: int = 50,
    samples_per_segment: int = 5,
) -> TrackingResult:
    """Shared-field benchmark solve, fully device-side.

    `lax.scan` over check_freq-step chunks of `solver.run_grouped` (batch-
    level: one occupancy field per `group_size` problems) with per-problem
    best-path bookkeeping in the scan carry — ONE dispatch for the whole
    budget, where the previous host chunk loop paid ~max_iterations/check_freq
    dispatches of random 0.1-0.4 s tunnel latency each.

    No per-problem early stop: the shared field must keep stepping for the
    whole group, so the full budget always runs and every chunk's path is a
    best-path candidate past min_iterations (the final chunk included —
    run_bench_mr.py:111-134 semantics in full-budget mode, the
    measured-better default, BASELINE_MEASURED.md).
    """
    num_chunks = -(-max_iterations // check_freq)
    paths0 = jax.vmap(solver.full_trajectory)(states)
    batch = paths0.shape[0]

    def eval_batch(paths):
        return jax.vmap(
            lambda o, p: evaluate_path(
                solver.oracle_fn, o, p, samples_per_segment
            )
        )(oracle_params, paths)

    def chunk_body(carry, c):
        states, best_path, best_length, best_feasible, iterations = carry
        states, _ = solver.run_grouped(
            states, oracle_params, check_freq, group_size
        )
        paths = jax.vmap(solver.full_trajectory)(states)
        collides, length = eval_batch(paths)
        done = (c + 1) * check_freq
        better = (done > min_iterations) & ~collides & (length < best_length)
        best_path = jnp.where(better[:, None, None], paths, best_path)
        best_length = jnp.where(better, length, best_length)
        best_feasible = best_feasible | better
        iterations = jnp.where(better, done, iterations)
        carry = (states, best_path, best_length, best_feasible, iterations)
        return carry, (collides, length)

    carry0 = (
        states,
        paths0,
        jnp.full((batch,), jnp.inf, jnp.float32),
        jnp.zeros((batch,), bool),
        jnp.zeros((batch,), jnp.int32),
    )
    carry, (collides_h, length_h) = jax.lax.scan(
        chunk_body, carry0, jnp.arange(num_chunks, dtype=jnp.int32)
    )
    states, best_path, best_length, best_feasible, iterations = carry
    # the last chunk's evaluation IS the final one; a final-iterate
    # feasibility counts even without a tracked best (run_with_tracking:
    # feasible = ~final_collides | has_best)
    final_collides, final_length = collides_h[-1], length_h[-1]
    final_paths = jax.vmap(solver.full_trajectory)(states)
    no_best = ~best_feasible
    best_path = jnp.where(no_best[:, None, None], final_paths, best_path)
    best_length = jnp.where(no_best, final_length, best_length)
    iterations = jnp.where(no_best, num_chunks * check_freq, iterations)
    feasible = best_feasible | (no_best & ~final_collides)
    return TrackingResult(
        state=states,
        path=best_path,
        length=best_length,
        feasible=feasible,
        iterations=iterations,
    )
