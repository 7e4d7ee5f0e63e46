"""Pure-jnp geometry / angle math used inside jitted solver code.

Semantics mirror the reference's `torch_math.py:5-7` (`wrap_angle`) and
`utils/math.py:34-54` (`wrap_angles`/`unfold_angles`/`sinc`), re-expressed for JAX.
Everything here is shape-polymorphic, differentiable where meaningful, and safe
under `jit`/`vmap` (no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "wrap_angle",
    "unfold_angles",
    "sinc",
    "segment_lengths",
    "arc_length_cdf",
    "dense_path",
]


def wrap_angle(angles: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles into (-pi, pi] (ref: torch_math.py:5-7)."""
    return (angles + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def unfold_angles(angles: jnp.ndarray) -> jnp.ndarray:
    """Make an angle sequence continuous by unwrapping +-2pi jumps.

    Ref: utils/math.py:38-43. Works on the last axis being the sequence axis
    for 1-D inputs (the only use case in the reference).
    """
    angles = wrap_angle(angles)
    delta = angles[1:] - angles[:-1]
    delta = jnp.where(delta > jnp.pi, delta - 2.0 * jnp.pi, delta)
    delta = jnp.where(delta < -jnp.pi, delta + 2.0 * jnp.pi, delta)
    return angles[0] + jnp.concatenate([jnp.zeros(1, angles.dtype), jnp.cumsum(delta)])


def sinc(x: jnp.ndarray, epsilon: float = 1e-4) -> jnp.ndarray:
    """sin(x)/x with epsilon clamping (utils/math.py:52-54).

    Deviation from the reference: its `np.sign(x) * epsilon` clamp yields
    NaN at exactly x == 0 (sign(0) == 0); here zero clamps to +epsilon so
    sinc(0) ≈ 1 as mathematically intended.
    """
    sign = jnp.where(x >= 0, 1.0, -1.0)
    x = jnp.where(jnp.abs(x) > epsilon, x, sign * epsilon)
    return jnp.sin(x) / x


def dense_path(full_path: jnp.ndarray, samples_per_segment: int) -> jnp.ndarray:
    """[M, d] -> [(M-1)*S + 1, d] dense samples; xy lerp + shortest-arc angle.

    The ONE densification used by both the benchmark evaluator
    (solver/tracking.py evaluate_path — the reference's interpolated validity
    check, BenchmarkAdapter.cpp:201-208) and the shortcut accept-check
    (ops/shortcut.py), so the two can never drift apart.
    """
    a = full_path[:-1]  # [M-1, d]
    b = full_path[1:]
    fractions = (
        jnp.arange(samples_per_segment, dtype=full_path.dtype) / samples_per_segment
    )
    delta = b - a
    if full_path.shape[1] == 3:
        delta = delta.at[:, 2].set(wrap_angle(delta[:, 2]))
    # [M-1, S, d]
    dense = a[:, None, :] + fractions[None, :, None] * delta[:, None, :]
    dense = dense.reshape(-1, full_path.shape[1])
    return jnp.concatenate([dense, full_path[-1:]], axis=0)


def segment_lengths(points: jnp.ndarray) -> jnp.ndarray:
    """Euclidean lengths of consecutive segments of a [N, d] polyline -> [N-1]."""
    delta = points[1:] - points[:-1]
    return jnp.sqrt(jnp.sum(delta * delta, axis=-1))


def arc_length_cdf(points: jnp.ndarray) -> jnp.ndarray:
    """Normalized cumulative arc length of a [N, d] polyline -> [N] in [0, 1].

    Matches the CDF built in the reference's reparametrization
    (nerf_opt_planner.py:224-231): zero-prepended cumsum of normalized distances.
    """
    dists = segment_lengths(points)
    # zero-length guard: a fully collapsed path (start == goal after a
    # tracked pose lands exactly on the final waypoint — update_start's
    # degenerate case) must yield a finite all-zero CDF, not 0/0 NaN that
    # poisons the whole state (and, grouped, the whole fleet's shared field)
    normalized = dists / jnp.maximum(jnp.sum(dists), 1e-12)
    cdf = jnp.cumsum(normalized)
    return jnp.concatenate([jnp.zeros(1, cdf.dtype), cdf])
