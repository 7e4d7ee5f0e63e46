"""Statically-scheduled chunked scan shared by every run loop.

The reference gates reparametrization dynamically (step_count % freq == 0,
nerf_opt_planner.py:60-71); under vmap a `lax.cond` lowers to select and
executes BOTH branches, so the batched run loops instead compile the schedule
statically: each chunk is [1 step with reparametrization, freq-1 plain steps].

Unrolling replicates the step body inside the compiled loops — on TPU the
step is dependency-chain/loop-overhead bound, and unrolling measured
14.26 -> 13.07 µs/step/problem (BASELINE_MEASURED.md). Numerics are identical
at any unroll factor (same ops, same order).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["scan_chunked"]


def scan_chunked(
    step_fn: Callable[[Any, bool], tuple[Any, Any]],
    state: Any,
    num_steps: int,
    freq: int,
    scan_unroll: int = 1,
    outer_scan_unroll: int = 1,
) -> tuple[Any, Any]:
    """Run `num_steps` steps as num_steps//freq chunks of [reparam step +
    freq-1 plain steps].

    step_fn(state, with_reparam) -> (state, aux). Requires freq > 1 and
    num_steps % freq == 0 (callers fall back to a dynamic scan otherwise).
    Returns (state, aux) with aux stacked [chunks, freq, ...]; callers
    reshape to their layout. Unroll factors are clamped to valid ranges.
    """
    def plain_body(carry, _):
        return step_fn(carry, False)

    unroll = max(1, min(scan_unroll, freq - 1))

    def chunk(carry, _):
        s, first_aux = step_fn(carry, True)
        s, rest_aux = jax.lax.scan(
            plain_body, s, None, length=freq - 1, unroll=unroll
        )
        aux = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a[None], b]), first_aux, rest_aux
        )
        return s, aux

    n_chunks = num_steps // freq
    outer = max(1, min(outer_scan_unroll, n_chunks))
    while n_chunks % outer != 0:
        outer -= 1
    return jax.lax.scan(chunk, state, None, length=n_chunks, unroll=outer)
