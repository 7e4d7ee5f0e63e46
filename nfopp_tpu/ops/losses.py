"""Loss terms for the NFOPP objective, as pure jnp functions.

Each function documents the reference code it reproduces; gradients flow exactly
as in the reference (stop_gradient placed where the reference calls .detach()).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .math import wrap_angle

__all__ = [
    "bce_with_logits",
    "softplus_beta",
    "distance_loss",
    "distance_loss_se2",
    "boundary_loss",
    "non_holonomic_constraint_deltas",
    "direction_constraint_deltas",
]


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross entropy on logits (torch.nn.BCEWithLogitsLoss,
    ref nerf_opt_planner.py:25,88). Numerically stable formulation."""
    loss = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def softplus_beta(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch.nn.functional.softplus(x, beta) with its linear-region threshold.

    Ref uses beta=collision_beta (constrained_nerf_opt_planner.py:87). torch
    switches to the identity where beta*x > 20 — replicated for bit parity.
    """
    scaled = beta * x
    safe = jnp.where(scaled > 20.0, 0.0, scaled)
    soft = jnp.log1p(jnp.exp(safe)) / beta
    return jnp.where(scaled > 20.0, x, soft)


def distance_loss(full_trajectory: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared consecutive deltas (ref nerf_opt_planner.py:161-164)."""
    delta = full_trajectory[1:] - full_trajectory[:-1]
    return jnp.sum(delta * delta)


def distance_loss_se2(full_trajectory: jnp.ndarray, angle_weight: float) -> jnp.ndarray:
    """Angle-weighted CHOMP distance term with the angle-sum closure correction.

    Ref constrained_nerf_opt_planner.py:120-130. Note the reference's exact
    gradient structure: the per-segment angle deltas entering the loss are the
    RAW (unwrapped) differences; only the closure term `angle_sum` uses wrapped
    deltas, and that sum is detached (stop_gradient) while the -goal+start
    angles contribute through the (constant) endpoints.
    """
    delta = full_trajectory[1:] - full_trajectory[:-1]
    delta_angles = wrap_angle(delta[:, 2])
    angle_sum = (
        jax.lax.stop_gradient(jnp.sum(delta_angles))
        - full_trajectory[-1, 2]
        + full_trajectory[0, 2]
    )
    corrected = delta[:, 2].at[-1].add(angle_sum) * angle_weight
    delta = delta.at[:, 2].set(corrected)
    return jnp.sum(delta * delta)


def boundary_loss(trajectory: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """Quadratic penalty outside bounds=[xmin,xmax,ymin,ymax] on the interior
    waypoints (ref nerf_opt_planner.py:171-176)."""
    x, y = trajectory[:, 0], trajectory[:, 1]
    loss = (
        jnp.maximum(bounds[0] - x, 0.0) ** 2
        + jnp.maximum(x - bounds[1], 0.0) ** 2
        + jnp.maximum(bounds[2] - y, 0.0) ** 2
        + jnp.maximum(y - bounds[3], 0.0) ** 2
    )
    return jnp.sum(loss)


def non_holonomic_constraint_deltas(full_trajectory: jnp.ndarray) -> jnp.ndarray:
    """Per-segment lateral-slip violations Δ = dx·sinθ̄ − dy·cosθ̄ -> [M-1].

    Ref constrained_nerf_opt_planner.py:102-109; θ̄ is the mid-segment heading
    via the wrapped forward angle difference.
    """
    dx = full_trajectory[1:, 0] - full_trajectory[:-1, 0]
    dy = full_trajectory[1:, 1] - full_trajectory[:-1, 1]
    angles = full_trajectory[:, 2]
    delta_angles = wrap_angle(angles[1:] - angles[:-1])
    mean_angles = angles[:-1] + delta_angles / 2.0
    return dx * jnp.sin(mean_angles) - dy * jnp.cos(mean_angles)


def direction_constraint_deltas(full_trajectory: jnp.ndarray) -> jnp.ndarray:
    """Per-segment backward-motion amounts -(cosθ̄·dx + sinθ̄·dy) -> [M-1].

    Ref constrained_nerf_opt_planner.py:111-118. The mid-segment heading here
    uses the wrapped BACKWARD angle difference (angles[:-1] - angles[1:]) — a
    deliberate asymmetry in the reference that is kept.
    """
    dx = full_trajectory[1:, 0] - full_trajectory[:-1, 0]
    dy = full_trajectory[1:, 1] - full_trajectory[:-1, 1]
    angles = full_trajectory[:, 2]
    delta_angles = wrap_angle(angles[:-1] - angles[1:])
    mean_angles = angles[:-1] + delta_angles / 2.0
    return -(jnp.cos(mean_angles) * dx + jnp.sin(mean_angles) * dy)
