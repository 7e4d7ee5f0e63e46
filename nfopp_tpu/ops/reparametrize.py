"""Arc-length trajectory reparametrization (device-side, fixed shape).

Mirrors the reference's `reparametrize_trajectory` for both the holonomic planner
(nerf_opt_planner.py:220-248) and the SE(2) constrained planner including the
re-interpolation of both Lagrange-multiplier vectors
(constrained_nerf_opt_planner.py:132-171). Implemented with
`jnp.searchsorted` + gathers — no host sync, batchable with `vmap`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math import arc_length_cdf, wrap_angle

__all__ = [
    "ArcLengthInterp",
    "arc_length_interp",
    "reparametrize_xy",
    "reparametrize_se2",
    "reparametrize_collision_multipliers",
    "reparametrize_constraint_multipliers",
]


class ArcLengthInterp(NamedTuple):
    """Shared interpolation data for one reparametrization pass.

    index_above/index_below: [N] gather indices into the full (N+2)-point path;
    t: [N] lerp coordinates. Built once, reused for the trajectory and both
    multiplier vectors exactly as the reference reuses them.
    """

    index_above: jnp.ndarray
    index_below: jnp.ndarray
    t: jnp.ndarray


def arc_length_interp(full_trajectory: jnp.ndarray, distance_dims: int) -> ArcLengthInterp:
    """Compute uniform-arc-length resample indices for a [M, d] path.

    distance_dims: how many leading coordinates enter the arc length (2 for the
    SE(2) planner which measures xy distance only,
    constrained_nerf_opt_planner.py:45-48; d for the holonomic planner).
    """
    m = full_trajectory.shape[0]
    cdf = arc_length_cdf(full_trajectory[:, :distance_dims])
    uniform = jnp.linspace(0.0, 1.0, m, dtype=full_trajectory.dtype)[1:-1]
    # searchsorted(side='left') as a comparison-count: one [M-2, M] vectorized
    # compare+reduce instead of a batched binary-search gather chain — much
    # faster on the TPU VPU under vmap at these sizes.
    indices = jnp.sum((cdf[None, :] < uniform[:, None]).astype(jnp.int32), axis=1)
    index_above = jnp.minimum(indices, m - 1)
    index_below = jnp.maximum(indices - 1, 0)
    cdf_above = cdf[index_above]
    cdf_below = cdf[index_below]
    denominator = cdf_above - cdf_below
    denominator = jnp.where(denominator < 1e-5, jnp.full_like(denominator, 1e-5), denominator)
    # by construction t is in [0, 1] for any nondegenerate cdf (index_above
    # is the comparison count, so cdf_below < u <= cdf_above) — the clamp is
    # a no-op there and only binds on degenerate all-zero CDFs (collapsed
    # paths), where an unbounded t amplifies float cancellation in the lerp
    t = jnp.clip((uniform - cdf_below) / denominator, 0.0, 1.0)
    return ArcLengthInterp(index_above, index_below, t)


def reparametrize_xy(full_trajectory: jnp.ndarray) -> jnp.ndarray:
    """Holonomic resample: plain lerp of every coordinate (ref :220-248).

    full_trajectory: [N+2, d] including pinned start/goal; returns new interior
    waypoints [N, d].
    """
    interp = arc_length_interp(full_trajectory, full_trajectory.shape[1])
    t = interp.t[:, None]
    below = full_trajectory[interp.index_below]
    above = full_trajectory[interp.index_above]
    return (1.0 - t) * below + t * above


def reparametrize_se2(full_trajectory: jnp.ndarray) -> tuple[jnp.ndarray, ArcLengthInterp]:
    """SE(2) resample: xy lerp + wrapped-angle lerp (ref constrained :132-152).

    Returns (new interior waypoints [N, 3], interp data for multiplier reuse).
    """
    interp = arc_length_interp(full_trajectory, 2)
    t = interp.t[:, None]
    below = full_trajectory[interp.index_below]
    above = full_trajectory[interp.index_above]
    xy = (1.0 - t) * below[:, :2] + t * above[:, :2]
    theta = below[:, 2] + interp.t * wrap_angle(above[:, 2] - below[:, 2])
    return jnp.concatenate([xy, theta[:, None]], axis=1), interp


def reparametrize_collision_multipliers(
    multipliers: jnp.ndarray, interp: ArcLengthInterp
) -> jnp.ndarray:
    """Re-interpolate the [N] per-waypoint collision multipliers (ref :153-158).

    The reference zero-pads to the N+2 full-path grid, gathers with the same
    indices as the trajectory, and lerps.
    """
    zero = jnp.zeros(1, multipliers.dtype)
    padded = jnp.concatenate([zero, multipliers, zero])
    below = padded[interp.index_below]
    above = padded[interp.index_above]
    return (1.0 - interp.t) * below + interp.t * above


def reparametrize_constraint_multipliers(
    multipliers: jnp.ndarray, interp: ArcLengthInterp
) -> jnp.ndarray:
    """Re-interpolate the [N+1] per-segment constraint multipliers (ref :160-171).

    Segment-centered values are averaged onto the N+2 node grid (end values
    replicated), lerped at the new interior nodes, then averaged back onto the
    N+1 new segments (end values replicated) — exactly the reference's two
    half-sample shifts.
    """
    nodes = jnp.concatenate(
        [multipliers[:1], 0.5 * (multipliers[:-1] + multipliers[1:]), multipliers[-1:]]
    )
    below = nodes[interp.index_below]
    above = nodes[interp.index_above]
    values = (1.0 - interp.t) * below + interp.t * above
    return jnp.concatenate([values[:1], 0.5 * (values[:-1] + values[1:]), values[-1:]])
