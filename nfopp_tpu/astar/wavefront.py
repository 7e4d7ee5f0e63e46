"""Batched device-side grid shortest paths: min-plus wavefront relaxation.

The TPU-native replacement for per-problem host A* when initializing thousands
of problems at once. A Dijkstra distance field is computed by iterating the
8-neighbor min-plus relaxation

    dist <- min(dist, shift_k(dist) + cost_k)        (k over 8 directions)

which is pure vectorized array math — it vmaps over a batch of occupancy grids
and runs entirely on device. The path is then extracted by greedy steepest
descent from the start cell (a short lax.scan), and resampled to the solver's
trajectory length by arc-length interpolation.

Cost model matches the host A* (`grid_search.py`): 1 per orthogonal step,
sqrt(2) per diagonal, obstacles impassable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["distance_field", "extract_path", "wavefront_path"]

# Plain Python float, not a jnp array: a module-level jnp constant would
# initialize the XLA backend at import time, which breaks
# jax.distributed.initialize() (must run before any backend init).
_INF = 3.0e38 / 4

# (di, dj, cost) for the 8-connected neighborhood
_STEPS = [
    (-1, 0, 1.0), (1, 0, 1.0), (0, -1, 1.0), (0, 1, 1.0),
    (-1, -1, 1.4142135), (-1, 1, 1.4142135), (1, -1, 1.4142135), (1, 1, 1.4142135),
]


def _shift(x: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Shift a [H, W] map by (di, dj), padding with +inf."""
    return jnp.roll(x, (di, dj), axis=(0, 1)) + _edge_mask(x.shape, di, dj)


def _edge_mask(shape, di: int, dj: int) -> jnp.ndarray:
    """+inf on rows/cols that wrapped around in the roll, 0 elsewhere."""
    h, w = shape
    mask = jnp.zeros(shape, jnp.float32)
    if di == 1:
        mask = mask.at[0, :].set(_INF)
    elif di == -1:
        mask = mask.at[h - 1, :].set(_INF)
    if dj == 1:
        mask = mask.at[:, 0].set(_INF)
    elif dj == -1:
        mask = mask.at[:, w - 1].set(_INF)
    return mask


def distance_field(
    blocked: jnp.ndarray, goal_cell: jnp.ndarray, num_iterations: int | None = None
) -> jnp.ndarray:
    """[H, W] geodesic distance to `goal_cell` (row, col); the FINITE sentinel
    `_INF` (~7.5e37, not jnp.inf — keeps min-plus arithmetic NaN-free) marks
    unreachable cells: test `d > 1e30`, not `isfinite`.

    num_iterations bounds the propagation front; default H + W covers any
    simple path's relaxation count (each sweep extends every shortest path by
    at least one cell).
    """
    h, w = blocked.shape
    if num_iterations is None:
        num_iterations = h + w
    blocked_f = jnp.where(blocked, _INF, 0.0).astype(jnp.float32)
    dist = jnp.full((h, w), _INF, jnp.float32)
    dist = dist.at[goal_cell[0], goal_cell[1]].set(0.0)

    def body(dist, _):
        best = dist
        for di, dj, cost in _STEPS:
            best = jnp.minimum(best, _shift(dist, di, dj) + cost)
        # obstacles stay unreachable
        best = jnp.minimum(dist, best + blocked_f)
        return best, None

    dist, _ = jax.lax.scan(body, dist, None, length=num_iterations)
    return dist


def extract_path(
    dist: jnp.ndarray, start_cell: jnp.ndarray, max_steps: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy steepest-descent walk start -> goal on a distance field.

    Returns (cells [max_steps+1, 2] int32, valid [max_steps+1] bool). Once the
    goal (dist == 0) is reached the walk stays put and further entries are
    flagged invalid; downstream resampling treats them as zero-length segments.
    """
    h, w = dist.shape
    if max_steps is None:
        max_steps = h + w
    steps = jnp.asarray([(di, dj) for di, dj, _ in _STEPS], jnp.int32)  # [8, 2]

    def body(carry, _):
        cell, arrived = carry
        neighbors = cell[None, :] + steps  # [8, 2]
        ni = jnp.clip(neighbors[:, 0], 0, h - 1)
        nj = jnp.clip(neighbors[:, 1], 0, w - 1)
        nd = dist[ni, nj]
        k = jnp.argmin(nd)
        better = nd[k] < dist[cell[0], cell[1]]
        move = better & ~arrived
        new_cell = jnp.where(move, jnp.stack([ni[k], nj[k]]), cell)
        arrived = arrived | (dist[new_cell[0], new_cell[1]] <= 0.0) | ~better
        return (new_cell, arrived), (new_cell, move)

    start_cell = jnp.asarray(start_cell, jnp.int32)
    (_, _), (cells, valid) = jax.lax.scan(
        body, (start_cell, jnp.asarray(False)), None, length=max_steps
    )
    cells = jnp.concatenate([start_cell[None], cells], axis=0)
    valid = jnp.concatenate([jnp.asarray([True]), valid])
    return cells, valid


def wavefront_path(
    blocked: jnp.ndarray,
    start_cell: jnp.ndarray,
    goal_cell: jnp.ndarray,
    num_points: int,
    origin: jnp.ndarray,
    resolution: jnp.ndarray,
    num_iterations: int | None = None,
) -> jnp.ndarray:
    """End-to-end: distance field -> greedy path -> world coords -> [num_points, 2]
    arc-length resample. vmap over a batch of (grids, starts, goals)."""
    dist = distance_field(blocked, goal_cell, num_iterations)
    cells, _ = extract_path(dist, start_cell)
    # world coordinates of cell centers; repeated trailing cells (post-arrival)
    # become zero-length segments and vanish under arc-length resampling
    world = origin[None, :] + (cells.astype(jnp.float32) + 0.5) * resolution
    seg = jnp.sqrt(jnp.sum((world[1:] - world[:-1]) ** 2, axis=-1))
    cum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg)])
    total = jnp.maximum(cum[-1], 1e-6)
    targets = jnp.linspace(0.0, 1.0, num_points) * total
    idx = jnp.clip(jnp.searchsorted(cum, targets) - 1, 0, cum.shape[0] - 2)
    denom = jnp.maximum(cum[idx + 1] - cum[idx], 1e-6)
    t = jnp.clip((targets - cum[idx]) / denom, 0.0, 1.0)
    return world[idx] * (1.0 - t[:, None]) + world[idx + 1] * t[:, None]
