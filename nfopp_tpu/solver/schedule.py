"""Statically-scheduled chunked scan shared by every run loop.

The reference gates reparametrization dynamically (step_count % freq == 0,
nerf_opt_planner.py:60-71); under vmap a `lax.cond` lowers to select and
executes BOTH branches, so the batched run loops instead compile the schedule
statically: each chunk is [1 step with reparametrization, freq-1 plain steps].

Unrolling replicates the step body inside the compiled loops — on TPU the
step is dependency-chain/loop-overhead bound, and unrolling measured
14.26 -> 13.07 µs/step/problem (BASELINE_MEASURED.md). Numerics are identical
at any unroll factor (same ops, same order).

field_stride generalizes the same static-scheduling idea to the FIELD update
(the reference's optimize_collision_model_freq, nerf_opt_planner.py:62-63 —
dynamically gated there, and useless under vmap for the same
both-branches-execute reason): with stride s > 1 the occupancy field trains
only on steps whose position within the chunk is a multiple of s. The field
update is ~2/3 of the TPU step's dependency chain, so striding it trades
field-training data for step throughput; quality at a given stride is an
empirical question measured per suite (BASELINE_MEASURED.md).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["scan_chunked"]


def _concat_aux(first: Any, rest: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[None], b]), first, rest
    )


def scan_chunked(
    step_fn: Callable[[Any, bool, bool], tuple[Any, Any]],
    state: Any,
    num_steps: int,
    freq: int,
    scan_unroll: int = 1,
    outer_scan_unroll: int = 1,
    field_stride: int = 1,
) -> tuple[Any, Any]:
    """Run `num_steps` steps as num_steps//freq chunks of [reparam step +
    freq-1 plain steps].

    step_fn(state, with_reparam, with_field) -> (state, aux). Requires
    freq > 1 and num_steps % freq == 0 (callers fall back to a dynamic scan
    otherwise). With field_stride s > 1 (s must divide freq, enforced below)
    the field flag is True only at chunk positions 0, s, 2s, ... Returns
    (state, aux) with aux stacked [chunks, freq, ...]; callers reshape to
    their layout. Unroll factors are clamped to valid ranges.
    """
    stride = max(1, field_stride)
    n_chunks = num_steps // freq
    outer = max(1, min(outer_scan_unroll, n_chunks))
    while n_chunks % outer != 0:
        outer -= 1

    if stride == 1:
        def plain_body(carry, _):
            return step_fn(carry, False, True)

        unroll = max(1, min(scan_unroll, freq - 1))

        def chunk(carry, _):
            s, first_aux = step_fn(carry, True, True)
            s, rest_aux = jax.lax.scan(
                plain_body, s, None, length=freq - 1, unroll=unroll
            )
            return s, _concat_aux(first_aux, rest_aux)

        return jax.lax.scan(chunk, state, None, length=n_chunks, unroll=outer)

    if freq % stride != 0:
        raise ValueError(f"field_stride {stride} must divide freq {freq}")
    groups = freq // stride  # field updates per chunk
    tail_len = stride - 1  # plain no-field steps after each field step
    tail_unroll = max(1, min(scan_unroll, tail_len)) if tail_len else 1
    group_unroll = max(1, min(scan_unroll, groups - 1)) if groups > 1 else 1

    def plain_body(carry, _):
        return step_fn(carry, False, False)

    def tail(carry):
        return jax.lax.scan(
            plain_body, carry, None, length=tail_len, unroll=tail_unroll
        )

    def group_body(carry, _):
        s, a0 = step_fn(carry, False, True)
        s, arest = tail(s)
        return s, _concat_aux(a0, arest)  # [stride, ...]

    def chunk(carry, _):
        s, a0 = step_fn(carry, True, True)
        s, ahead = tail(s)
        first = _concat_aux(a0, ahead)  # [stride, ...]
        s, agroups = jax.lax.scan(
            group_body, s, None, length=groups - 1, unroll=group_unroll
        )  # [groups-1, stride, ...]
        aux = _concat_aux(first, agroups)  # [groups, stride, ...]
        aux = jax.tree_util.tree_map(
            lambda x: x.reshape((freq,) + x.shape[2:]), aux
        )
        return s, aux

    return jax.lax.scan(chunk, state, None, length=n_chunks, unroll=outer)
