"""Device-side collision oracles.

The reference queries a host-side numpy/C++ oracle from inside the hot loop
(`collision_checker/*.py`, `benchmark_adapter/*`), forcing >=3 device<->host round
trips per optimization step (SURVEY.md §3.2). Here every oracle is a pure jnp
function over fixed-shape parameters, so ground-truth labels are computed on-TPU
inside the jitted step, and a batch of problems carries a batched oracle pytree.

Oracles provided (mirroring the reference inventory, SURVEY.md §2 L2):
  * boundary box          (collision_checker/collision_checker.py:9-28)
  * circle footprint      (circle_collision_checker.py:11-14) — point robot variant
    checks translation only (circle_directed_collision_checker.py:5-6)
  * rectangle footprint   (rectangle_collision_checker.py:11-26)
  * occupancy-grid bitmap (replaces the bench-mr C++ oracle for benchmark worlds;
    footprints are folded in by host-side grid dilation, see worlds/scenarios.py)

Variable obstacle counts are handled with padding + a validity mask so shapes
stay static under jit/vmap.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "CircleOracle",
    "RectangleOracle",
    "GridOracle",
    "PolygonOracle",
    "boundary_collision",
    "circle_collision",
    "rectangle_collision",
    "grid_collision",
    "polygon_collision",
    "polygon_clearance",
    "pad_obstacle_points",
    "pad_polygons",
]

# Far-away sentinel for padded obstacle slots; combined with the mask so padded
# slots can never produce a collision even without the mask.
_PAD_VALUE = 1e9


class CircleOracle(NamedTuple):
    """Disc robot of `radius` against point obstacles + boundary box."""

    points: jnp.ndarray  # [P, 2] padded obstacle points
    mask: jnp.ndarray  # [P] bool, True for real obstacles
    radius: jnp.ndarray  # scalar
    bounds: jnp.ndarray  # [4] = (xmin, xmax, ymin, ymax)


class RectangleOracle(NamedTuple):
    """Rectangle footprint `box`=(xmin, xmax, ymin, ymax) in the robot frame."""

    points: jnp.ndarray  # [P, 2]
    mask: jnp.ndarray  # [P]
    box: jnp.ndarray  # [4]
    bounds: jnp.ndarray  # [4]


class GridOracle(NamedTuple):
    """Occupancy-bitmap world. occupancy[i, j] covers the world cell with
    x in [origin_x + j*res, origin_x + (j+1)*res), y likewise with row i —
    i.e. rows index y, columns index x (image convention)."""

    occupancy: jnp.ndarray  # [H, W] bool/float, True = collision
    origin: jnp.ndarray  # [2] world (x, y) of the grid's lower corner
    resolution: jnp.ndarray  # scalar cell size
    bounds: jnp.ndarray  # [4]


class PolygonOracle(NamedTuple):
    """EXACT polygonal obstacles — the geometry the reference's bench-mr
    binding evaluates against (OMPL SE(2) state validity over the true
    polygon environment, BenchmarkAdapter.cpp:175-187; clearance vs the true
    obstacles, :106-135) — here as a pure device function, no rasterization.

    A pose collides iff its xy is inside any polygon (even-odd rule), or
    within `radius` of any polygon edge (disc-footprint inflation; 0 = point
    robot), or outside the boundary box. Polygon loops are padded to a fixed
    [P, K, 2] shape: within a loop by repeating the last vertex (zero-length
    edges cross no ray and add no closer distance than the vertex itself),
    empty polygon slots by far-away sentinel vertices + mask=False.
    """

    vertices: jnp.ndarray  # [P, K, 2] padded vertex loops
    mask: jnp.ndarray  # [P] bool, True for real polygons
    radius: jnp.ndarray  # scalar footprint inflation (0 = point robot)
    bounds: jnp.ndarray  # [4]


def pad_polygons(
    polygons: list[np.ndarray], capacity: int | None = None,
    max_vertices: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Pad a list of [K_i, 2] vertex loops to ([P, K, 2], mask[P])."""
    count = len(polygons)
    p = capacity if capacity is not None else count
    if count > p:
        raise ValueError(f"{count} polygons exceed capacity {p}")
    k = max_vertices if max_vertices is not None else max(
        (len(poly) for poly in polygons), default=1
    )
    vertices = np.full((p, k, 2), _PAD_VALUE, dtype=np.float32)
    mask = np.zeros(p, dtype=bool)
    for i, poly in enumerate(polygons):
        poly = np.asarray(poly, np.float32)
        if len(poly) > k:
            raise ValueError(f"polygon {i} has {len(poly)} > {k} vertices")
        vertices[i, : len(poly)] = poly
        vertices[i, len(poly) :] = poly[-1]  # zero-length edges: inert
        mask[i] = True
    return vertices, mask


def _polygon_inside(oracle: PolygonOracle, xy: jnp.ndarray) -> jnp.ndarray:
    """[M, 2] -> [M] bool: inside any (masked) polygon, even-odd rule."""
    v0 = oracle.vertices  # [P, K, 2]
    v1 = jnp.roll(oracle.vertices, -1, axis=1)
    x, y = xy[:, 0, None, None], xy[:, 1, None, None]  # [M, 1, 1]
    y0, y1 = v0[None, :, :, 1], v1[None, :, :, 1]
    x0, x1 = v0[None, :, :, 0], v1[None, :, :, 0]
    straddles = (y0 > y) != (y1 > y)
    # x coordinate where the edge crosses the horizontal ray through y
    t = (y - y0) / (y1 - y0 + 1e-30)
    crosses = straddles & (x < x0 + t * (x1 - x0))
    parity = jnp.sum(crosses, axis=2) % 2  # [M, P]
    return jnp.any((parity == 1) & oracle.mask[None, :], axis=1)


def _polygon_edge_distance(oracle: PolygonOracle, xy: jnp.ndarray) -> jnp.ndarray:
    """[M, 2] -> [M] exact min distance to any (masked) polygon edge."""
    v0 = oracle.vertices  # [P, K, 2]
    v1 = jnp.roll(oracle.vertices, -1, axis=1)
    d = v1 - v0  # [P, K, 2]
    w = xy[:, None, None, :] - v0[None]  # [M, P, K, 2]
    denom = jnp.maximum(jnp.sum(d * d, axis=-1), 1e-30)  # [P, K]
    t = jnp.clip(jnp.sum(w * d[None], axis=-1) / denom[None], 0.0, 1.0)
    closest = v0[None] + t[..., None] * d[None]  # [M, P, K, 2]
    diff = xy[:, None, None, :] - closest
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # [M, P, K]
    dist = jnp.where(oracle.mask[None, :, None], dist, jnp.inf)
    return jnp.min(dist, axis=(1, 2))


def polygon_collision(oracle: PolygonOracle, positions: jnp.ndarray) -> jnp.ndarray:
    """[M, >=2] query poses -> [M] bool against EXACT polygon geometry.

    inside-any-polygon (even-odd) | edge distance < radius | out of bounds —
    equivalent to checking the disc footprint against the true polygons (what
    the rasterized GridOracle only approximates at cell resolution)."""
    xy = positions[:, :2]
    hit = _polygon_inside(oracle, xy)
    near = jnp.where(
        oracle.radius > 0,
        _polygon_edge_distance(oracle, xy) < oracle.radius,
        False,
    )
    return hit | near | boundary_collision(oracle.bounds, xy)


def polygon_clearance(oracle: PolygonOracle, xy: jnp.ndarray) -> jnp.ndarray:
    """[M, 2] -> [M] exact clearance: distance to the nearest polygon edge
    (0 inside an obstacle — matching clearance vs the true environment,
    BenchmarkAdapter.cpp:106-135)."""
    dist = _polygon_edge_distance(oracle, xy)
    return jnp.where(_polygon_inside(oracle, xy), 0.0, dist)


def pad_obstacle_points(points: np.ndarray, capacity: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a [P, 2] obstacle array to `capacity` rows; returns (points, mask)."""
    count = points.shape[0]
    if count > capacity:
        raise ValueError(f"{count} obstacle points exceed capacity {capacity}")
    padded = np.full((capacity, 2), _PAD_VALUE, dtype=np.float32)
    padded[:count] = points
    mask = np.zeros(capacity, dtype=bool)
    mask[:count] = True
    return padded, mask


def boundary_collision(bounds: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """True where xy [M, 2] lies outside bounds (ref collision_checker.py:15-21)."""
    x, y = xy[:, 0], xy[:, 1]
    return (x > bounds[1]) | (x < bounds[0]) | (y > bounds[3]) | (y < bounds[2])


def circle_collision(oracle: CircleOracle, positions: jnp.ndarray) -> jnp.ndarray:
    """[M, >=2] query poses -> [M] bool. Angle channel (if any) is ignored,
    matching CircleDirectedCollisionChecker (checks `.translation` only)."""
    xy = positions[:, :2]
    diff = xy[:, None, :] - oracle.points[None, :, :]  # [M, P, 2]
    dist_sq = jnp.sum(diff * diff, axis=-1)
    hit = (dist_sq < oracle.radius**2) & oracle.mask[None, :]
    return jnp.any(hit, axis=1) | boundary_collision(oracle.bounds, xy)


def rectangle_collision(oracle: RectangleOracle, positions: jnp.ndarray) -> jnp.ndarray:
    """[M, 3] SE(2) poses -> [M] bool.

    Transforms obstacle points into each robot frame and box-tests them
    (ref rectangle_collision_checker.py:11-26). Strict inequalities as in the
    reference (points exactly on the box edge do not collide).
    """
    px, py, theta = positions[:, 0], positions[:, 1], positions[:, 2]
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    ox = oracle.points[None, :, 0] - px[:, None]
    oy = oracle.points[None, :, 1] - py[:, None]
    local_x = cos_t[:, None] * ox + sin_t[:, None] * oy
    local_y = -sin_t[:, None] * ox + cos_t[:, None] * oy
    inside = (
        (local_x > oracle.box[0])
        & (local_x < oracle.box[1])
        & (local_y > oracle.box[2])
        & (local_y < oracle.box[3])
        & oracle.mask[None, :]
    )
    return jnp.any(inside, axis=1) | boundary_collision(oracle.bounds, positions[:, :2])


def grid_collision(oracle: GridOracle, positions: jnp.ndarray) -> jnp.ndarray:
    """[M, >=2] query poses -> [M] bool via nearest-cell occupancy lookup."""
    xy = positions[:, :2]
    h, w = oracle.occupancy.shape
    j = jnp.floor((xy[:, 0] - oracle.origin[0]) / oracle.resolution).astype(jnp.int32)
    i = jnp.floor((xy[:, 1] - oracle.origin[1]) / oracle.resolution).astype(jnp.int32)
    i = jnp.clip(i, 0, h - 1)
    j = jnp.clip(j, 0, w - 1)
    occupied = oracle.occupancy[i, j].astype(bool)
    return occupied | boundary_collision(oracle.bounds, xy)
