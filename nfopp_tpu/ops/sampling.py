"""Device-side sampling primitives for the solver hot loop.

The reference does all sampling host-side with numpy (`nerf_opt_planner.py:101-141`)
— including `np.random.choice(..., replace=False, p=weights)` for the experience
replay buffer resampling (:122-133), which forces a device->host->device round trip
per step. Here everything is a fixed-shape jnp computation:

  * weighted sampling *without replacement* is the Gumbel-top-k trick
    (perturb log-weights with Gumbel noise, take top-k), which is exactly
    equivalent in distribution to successive weighted draws without replacement;
  * uniform segment-interpolation sampling mirrors `_random_intermediate_positions`
    (:113-117) and the constrained variant (constrained_nerf_opt_planner.py:78-81).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "gumbel_noise",
    "gumbel_topk_indices",
    "gumbel_topk_log_indices",
    "random_intermediate_positions",
    "uniform_box_points",
]


def gumbel_noise(uniform: jnp.ndarray) -> jnp.ndarray:
    """Standard Gumbel noise from uniform(0, 1) draws."""
    return -jnp.log(-jnp.log(jnp.maximum(uniform, 1e-20) + 1e-20))


def gumbel_topk_indices(key: jax.Array, weights: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of a weighted sample of size k without replacement.

    `weights` are unnormalized non-negative weights; entries with weight <= 0
    are effectively excluded (they can only be picked once all positive-weight
    entries are exhausted, matching np.random.choice's replace fallback edge
    case in spirit — ref nerf_opt_planner.py:128-130).
    """
    gumbel = gumbel_noise(jax.random.uniform(key, weights.shape, minval=1e-20, maxval=1.0))
    scores = jnp.log(jnp.maximum(weights, 1e-30)) + gumbel
    _, indices = jax.lax.top_k(scores, k)
    return indices


def gumbel_topk_log_indices(log_weights: jnp.ndarray, gumbel: jnp.ndarray, k: int) -> jnp.ndarray:
    """`gumbel_topk_indices` with log-space weights and pre-drawn Gumbel noise.

    Equivalent in distribution; saves the exp/log round trip when the weights
    are naturally computed in log space (e.g. log-sigmoid confidence + linear
    age decay) and lets callers coalesce the noise draw with other uniforms.
    """
    _, indices = jax.lax.top_k(log_weights + gumbel, k)
    return indices


def random_intermediate_positions(key: jax.Array, trajectory: jnp.ndarray) -> jnp.ndarray:
    """One uniform point per segment of a [N, d] trajectory -> [N-1, d].

    Ref: nerf_opt_planner.py:113-117 (t drawn per segment, lerp between
    consecutive waypoints: traj[1:] * (1 - t) + traj[:-1] * t).
    """
    n = trajectory.shape[0]
    t = jax.random.uniform(key, (n - 1, 1), dtype=trajectory.dtype)
    return trajectory[1:] * (1.0 - t) + trajectory[:-1] * t


def uniform_box_points(
    key: jax.Array, count: int, bounds: jnp.ndarray, with_angle: bool = False
) -> jnp.ndarray:
    """Uniform random points in an axis-aligned box bounds=[xmin,xmax,ymin,ymax].

    Ref: nerf_opt_planner.py:135-141; the constrained variant appends a uniform
    angle in [0, 2pi) (constrained_nerf_opt_planner.py:173-176).
    """
    dim = 3 if with_angle else 2
    u = jax.random.uniform(key, (count, dim))
    x = bounds[0] + u[:, 0] * (bounds[1] - bounds[0])
    y = bounds[2] + u[:, 1] * (bounds[3] - bounds[2])
    if with_angle:
        theta = u[:, 2] * 2.0 * jnp.pi
        return jnp.stack([x, y, theta], axis=1)
    return jnp.stack([x, y], axis=1)
