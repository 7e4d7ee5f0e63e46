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
from ..ops.sampling import gumbel_noise, gumbel_topk_log_indices
from .config import SolverConfig

__all__ = [
    "FieldSample",
    "FieldSamplePre",
    "field_sample_pre",
    "field_sample_post",
    "sample_field_points",
    "field_loss_and_grad",
]


class FieldSample(NamedTuple):
    """Training points for one field step + the updated replay buffer."""

    train_points: jnp.ndarray  # [(N-1) + K + R, dim]
    buffer_points: jnp.ndarray  # [K, dim]
    buffer_ages: jnp.ndarray  # [K]


class FieldSamplePre(NamedTuple):
    """Everything drawn before the candidate-scoring field pass."""

    coarse: jnp.ndarray  # [N-1, dim] coarse-jittered segment samples
    fine: jnp.ndarray  # [N-1, dim] fine-jittered segment samples (buffer candidates)
    gumbel: jnp.ndarray  # [K + N-1] Gumbel noise for the resampling top-k
    random_points: jnp.ndarray  # [R, dim] uniform field points


def field_sample_pre(
    config: SolverConfig,
    key: jax.Array,
    prev_trajectory: jnp.ndarray,
    bounds: jnp.ndarray,
) -> FieldSamplePre:
    """Draw every random quantity of one field-sampling step in two RNG calls
    (one uniform block, one normal block) — RNG kernel count matters at this
    per-problem size; the noise is independent of the candidate scores so it
    can all be drawn before the scoring pass.

    Ref semantics: segment lerp `_random_intermediate_positions`
    (nerf_opt_planner.py:113-117, NO angle wrap here), coarse/fine Gaussian
    jitter with per-channel sigma (:103-104,119-120;
    constrained_nerf_opt_planner.py:57-61), uniform box points (:135-141,
    constrained :173-176).
    """
    n = prev_trajectory.shape[0]
    dim = prev_trajectory.shape[-1]
    with_angle = dim == 3
    k_uni, k_norm = jax.random.split(key, 2)

    cand = config.collision_point_count + (n - 1)
    r = config.random_field_points
    u = jax.random.uniform(k_uni, ((n - 1) + cand + r * dim,), dtype=jnp.float32)
    t = u[: n - 1, None]
    gumbel = gumbel_noise(u[n - 1 : n - 1 + cand])
    ur = u[n - 1 + cand :].reshape(r, dim)

    x = bounds[0] + ur[:, 0] * (bounds[1] - bounds[0])
    y = bounds[2] + ur[:, 1] * (bounds[3] - bounds[2])
    if with_angle:
        random_points = jnp.stack([x, y, ur[:, 2] * (2.0 * jnp.pi)], axis=1)
    else:
        random_points = jnp.stack([x, y], axis=1)

    positions = prev_trajectory[1:] * (1.0 - t) + prev_trajectory[:-1] * t
    noise = jax.random.normal(k_norm, (2, n - 1, dim), dtype=jnp.float32)
    if with_angle:
        coarse_scale = jnp.array(
            [config.course_random_offset] * 2 + [config.angle_offset], jnp.float32
        )
        fine_scale = jnp.array(
            [config.trajectory_random_offset] * 2 + [config.angle_offset], jnp.float32
        )
    else:
        coarse_scale = jnp.float32(config.course_random_offset)
        fine_scale = jnp.float32(config.trajectory_random_offset)
    coarse = positions + noise[0] * coarse_scale
    fine = positions + noise[1] * fine_scale
    return FieldSamplePre(coarse, fine, gumbel, random_points)


def field_sample_post(
    config: SolverConfig,
    pre: FieldSamplePre,
    logits: jnp.ndarray,
    candidates: jnp.ndarray,
    candidate_ages: jnp.ndarray,
) -> FieldSample:
    """Resample the replay buffer from scored candidates and assemble the
    training batch in the reference's order [coarse, buffer, random]
    (nerf_opt_planner.py:101-111).

    Resampling weight is sigmoid(field) * exp(-decay * age) + 1e-6 (:122-133)
    — taken in log space (logaddexp with log 1e-6) so the weighted
    sample-without-replacement is one fused add + top-k. The 1e-6 floor
    matters in the saturated regime: once the field confidently predicts free
    space everywhere (all sigmoids << 1e-6), the floor makes resampling
    near-uniform and re-diversifies the buffer, where raw log-sigmoids would
    keep it peaked on the least-negative logits forever. (Deviation: the
    reference switches to replacement=True when fewer than K weights exceed
    the floor, :130; Gumbel top-k stays without-replacement — near-uniform
    over candidates in that regime, which only diversifies MORE.)
    """
    log_w = jax.nn.log_sigmoid(logits) - candidate_ages * config.buffer_age_decay
    if config.buffer_weight_floor > 0:
        log_w = jnp.logaddexp(log_w, jnp.log(config.buffer_weight_floor))
    idx = gumbel_topk_log_indices(log_w, pre.gumbel, config.collision_point_count)
    new_buffer = candidates[idx]
    new_ages = candidate_ages[idx] + 1.0
    train_points = jnp.concatenate([pre.coarse, new_buffer, pre.random_points], axis=0)
    return FieldSample(train_points, new_buffer, new_ages)


def sample_field_points(
    config: SolverConfig,
    key: jax.Array,
    prev_trajectory: jnp.ndarray,
    buffer_points: jnp.ndarray,
    buffer_ages: jnp.ndarray,
    field_params: dict,
    bounds: jnp.ndarray,
    score_fn=None,
) -> FieldSample:
    """Assemble the field-training batch (ref _sample_collision_checker_points,
    nerf_opt_planner.py:101-111) and advance the replay buffer.

    Returns coarse-jittered segment samples + resampled buffer + uniform field
    points, concatenated in the reference's order. Buffer resampling is a
    weighted draw without replacement via Gumbel-top-k (see field_sample_post).
    """
    pre = field_sample_pre(config, key, prev_trajectory, bounds)
    candidates = jnp.concatenate([buffer_points, pre.fine], axis=0)
    candidate_ages = jnp.concatenate(
        [buffer_ages, jnp.zeros(pre.fine.shape[0], buffer_ages.dtype)]
    )
    if score_fn is None:
        logits = onf_apply(field_params, candidates, config.onf)[:, 0]
    else:
        # experimental hook (e.g. the fused VMEM-resident Pallas kernel —
        # TPU-measured slower than XLA's batched fusions, BASELINE_MEASURED.md)
        logits = score_fn(field_params, candidates)
    return field_sample_post(config, pre, logits, candidates, candidate_ages)


def field_loss_and_grad(
    config: SolverConfig,
    field_params: dict,
    points: jnp.ndarray,
    truth: jnp.ndarray,
) -> tuple[jnp.ndarray, dict]:
    """BCE-with-logits loss of field predictions vs oracle truth + param grads
    (ref _optimize_collision_model, nerf_opt_planner.py:76-91).

    The fused-Pallas alternative lives in nfopp_tpu.experimental (TPU-measured
    slower; BASELINE_MEASURED.md).
    """

    def loss_fn(params):
        logits = onf_apply(params, points, config.onf)
        return bce_with_logits(logits, truth[:, None].astype(jnp.float32))

    return jax.value_and_grad(loss_fn)(field_params)
