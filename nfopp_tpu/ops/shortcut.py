"""Device-side random-pair path shortcutting (OMPL PathSimplifier role).

The reference ships no path simplification: its returned path is the raw
optimizer iterate (nerf_opt_planner.py get_path), and the bench-mr ecosystem
it plugs into delegates simplification to OMPL's PathSimplifier, which the
reference never invokes (BenchmarkAdapter.cpp evaluates the path as given).
This op adds that capability TPU-natively: a fixed-trial `lax.scan` of
random-pair shortcut attempts, each a fixed-shape candidate build + dense
collision check — no dynamic shapes, vmaps over the problem batch.

One trial: pick i < j, replace the points strictly between them with samples
of the straight chord path[i] -> path[j] (xy lerp; shortest-arc angle lerp
for SE(2) paths), accept iff the whole candidate is collision-free at the
same dense sampling used by the benchmark evaluator (tracking.evaluate_path).
The chord can't be longer than the polyline it replaces, so accepted trials
monotonically shorten the path; endpoints never move.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from .math import dense_path, wrap_angle

__all__ = ["shortcut_path", "shortcut_batch"]

OracleFn = Callable[[Any, jnp.ndarray], jnp.ndarray]


def _dense_collides(
    oracle_fn: OracleFn,
    oracle_params: Any,
    path: jnp.ndarray,
    samples_per_segment: int,
) -> jnp.ndarray:
    """Whole-path dense collision check — SAME densification as the benchmark
    evaluator (ops.math.dense_path, used by tracking.evaluate_path), so an
    accepted candidate is collision-free under the evaluator by construction."""
    return jnp.any(
        oracle_fn(oracle_params, dense_path(path, samples_per_segment))
    )


def shortcut_path(
    oracle_fn: OracleFn,
    oracle_params: Any,
    path: jnp.ndarray,
    key: jax.Array,
    num_trials: int = 64,
    samples_per_segment: int = 5,
) -> jnp.ndarray:
    """Shorten one [M, d] path (d = 2 or 3) by num_trials shortcut attempts.

    Every ACCEPTED candidate is whole-path collision-free at the evaluator's
    density, so the output of a feasible input stays feasible. An infeasible
    input usually comes back unchanged (candidates keeping the colliding span
    fail the check) — but a chord spanning the entire colliding region can
    produce a collision-free candidate, in which case the path is REPAIRED to
    feasible; callers should re-evaluate the output rather than assume the
    input's feasibility (bench/runner.py does).
    """
    m = path.shape[0]
    idx = jnp.arange(m)

    def trial(p, k):
        k1, k2 = jax.random.split(k)
        i = jax.random.randint(k1, (), 0, m - 2)
        j = jax.random.randint(k2, (), i + 2, m)
        a, b = p[i], p[j]
        delta = b - a
        if p.shape[1] == 3:
            delta = delta.at[2].set(wrap_angle(delta[2]))
        t = jnp.clip((idx - i) / (j - i), 0.0, 1.0).astype(p.dtype)[:, None]
        chord = a[None] + t * delta[None]
        inside = (idx > i) & (idx < j)
        cand = jnp.where(inside[:, None], chord, p)
        collides = _dense_collides(
            oracle_fn, oracle_params, cand, samples_per_segment
        )
        return jnp.where(collides, p, cand), None

    keys = jax.random.split(key, num_trials)
    path, _ = jax.lax.scan(trial, path, keys)
    return path


def shortcut_batch(
    oracle_fn: OracleFn,
    oracle_params: Any,
    paths: jnp.ndarray,
    key: jax.Array,
    num_trials: int = 64,
    samples_per_segment: int = 5,
) -> jnp.ndarray:
    """vmap of shortcut_path over leading batch axes of paths/oracle_params."""
    keys = jax.random.split(key, paths.shape[0])
    return jax.vmap(
        lambda o, p, k: shortcut_path(
            oracle_fn, o, p, k, num_trials, samples_per_segment
        )
    )(oracle_params, paths, keys)
