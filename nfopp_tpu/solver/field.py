"""Online occupancy-field training — the first half of each solver step.

Device-side re-design of the reference's host-bound sampling pipeline
(nerf_opt_planner.py:76-141): segment sampling, coarse/fine Gaussian jitter, a
fixed-capacity experience-replay buffer with confidence×age-decay weighted
resampling (Gumbel-top-k instead of np.random.choice), uniform field points, an
on-device oracle query, and one Adam step on the BCE loss. Everything is fixed
shape, so the whole thing lives inside the jitted solver step and vmaps over a
problem batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.onf import onf_apply
from ..ops.losses import bce_with_logits
from ..ops.sampling import gumbel_topk_indices, uniform_box_points
from .config import SolverConfig

__all__ = ["FieldSample", "sample_field_points", "field_loss_and_grad"]


class FieldSample(NamedTuple):
    """Training points for one field step + the updated replay buffer."""

    train_points: jnp.ndarray  # [(N-1) + K + R, dim]
    buffer_points: jnp.ndarray  # [K, dim]
    buffer_ages: jnp.ndarray  # [K]


def _offset_positions(
    key: jax.Array, positions: jnp.ndarray, xy_sigma: float, angle_sigma: float
) -> jnp.ndarray:
    """Gaussian jitter; for SE(2) points the angle channel gets its own sigma
    (constrained_nerf_opt_planner.py:57-61), 2-D points jitter both coords
    (nerf_opt_planner.py:119-120)."""
    noise = jax.random.normal(key, positions.shape, dtype=positions.dtype)
    if positions.shape[-1] == 3:
        scale = jnp.array([xy_sigma, xy_sigma, angle_sigma], positions.dtype)
    else:
        scale = jnp.array([xy_sigma, xy_sigma], positions.dtype)
    return positions + noise * scale


def sample_field_points(
    config: SolverConfig,
    key: jax.Array,
    prev_trajectory: jnp.ndarray,
    buffer_points: jnp.ndarray,
    buffer_ages: jnp.ndarray,
    field_params: dict,
    bounds: jnp.ndarray,
) -> FieldSample:
    """Assemble the field-training batch (ref _sample_collision_checker_points,
    nerf_opt_planner.py:101-111) and advance the replay buffer.

    Returns coarse-jittered segment samples + resampled buffer + uniform field
    points, concatenated in the reference's order. Buffer resampling weight is
    sigmoid(field) * exp(-decay * age) + 1e-6 (:122-133), drawn without
    replacement via Gumbel-top-k.
    """
    k_t, k_coarse, k_fine, k_gumbel, k_rand = jax.random.split(key, 5)
    with_angle = prev_trajectory.shape[-1] == 3

    # One uniform point per segment; plain lerp on every channel — the reference
    # does NOT wrap the angle here (only trajectory_loss sampling wraps).
    n = prev_trajectory.shape[0]
    t = jax.random.uniform(k_t, (n - 1, 1), dtype=prev_trajectory.dtype)
    positions = prev_trajectory[1:] * (1.0 - t) + prev_trajectory[:-1] * t

    coarse = _offset_positions(k_coarse, positions, config.course_random_offset, config.angle_offset)
    fine = _offset_positions(k_fine, positions, config.trajectory_random_offset, config.angle_offset)

    candidates = jnp.concatenate([buffer_points, fine], axis=0)
    candidate_ages = jnp.concatenate(
        [buffer_ages, jnp.zeros(fine.shape[0], buffer_ages.dtype)]
    )
    if config.use_fused_field_grad:
        # score candidates in the fused VMEM-resident kernel: the XLA path
        # materializes every [B, 199, 100..320] activation to HBM (profiled
        # HBM-bound, BASELINE_MEASURED.md)
        from ..ops.pallas.onf_fused import onf_apply_fused_single

        interpret = jax.default_backend() == "cpu"
        logits = onf_apply_fused_single(
            field_params, candidates, config.onf, interpret=interpret
        )[:, 0]
    else:
        logits = onf_apply(field_params, candidates, config.onf)[:, 0]
    weights = jax.nn.sigmoid(logits) * jnp.exp(-candidate_ages * config.buffer_age_decay) + 1e-6
    idx = gumbel_topk_indices(k_gumbel, weights, config.collision_point_count)
    new_buffer = candidates[idx]
    new_ages = candidate_ages[idx] + 1.0

    random_points = uniform_box_points(k_rand, config.random_field_points, bounds, with_angle)
    train_points = jnp.concatenate([coarse, new_buffer, random_points], axis=0)
    return FieldSample(train_points, new_buffer, new_ages)


def field_loss_and_grad(
    config: SolverConfig,
    field_params: dict,
    points: jnp.ndarray,
    truth: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    """BCE-with-logits loss of field predictions vs oracle truth + param grads
    (ref _optimize_collision_model, nerf_opt_planner.py:76-91).

    With config.use_fused_field_grad the fused Pallas kernel computes loss and
    all parameter gradients in one VMEM-resident pass (same numbers up to f32
    reassociation; interpreter mode on CPU backends).
    """
    if config.use_fused_field_grad:
        from ..ops.pallas.field_grad import field_loss_and_grad_fused

        interpret = jax.default_backend() == "cpu"
        return field_loss_and_grad_fused(
            config.onf, field_params, points, truth, interpret=interpret
        )

    def loss_fn(params):
        logits = onf_apply(params, points, config.onf)
        return bce_with_logits(logits, truth[:, None].astype(jnp.float32))

    return jax.value_and_grad(loss_fn)(field_params)
