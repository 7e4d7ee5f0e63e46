"""Merged field+trajectory sub-step — one ONF pass for the whole solver step.

Structural optimization over the Jacobi step order (`SolverConfig.jacobi_step`):
when the trajectory update reads the ENTRY field parameters, all three field
passes of one solver step use the same parameters —

  1. candidate scoring for the replay-buffer resample
     (ref nerf_opt_planner.py:122-133)                       forward, ~K+N-1 pts
  2. BCE field training (ref :76-91)                         fwd+bwd(params), ~N-1+K+R pts
  3. trajectory collision terms
     (ref constrained_nerf_opt_planner.py:78-89)             fwd+bwd(positions), ~(N-1)*S pts

— so they fuse into ONE forward over the concatenated point set and ONE
hand-written backward chain. Backprop through a pointwise MLP is row-
independent: a single cotangent chain serves both the parameter gradients
(summed over the training-row slice) and the position gradients (taken from
the collision-row slice). No gathers are needed: instead of gathering the
resampled buffer rows' activations, the BCE cotangent of every candidate row
is multiplied by its 0/1 selected mask (mathematically identical, since BCE
is a per-row sum).

Why this wins on TPU: the per-problem tensors are tiny (M≈100-400 rows, width
≤200), so the batched step is dependency-chain / per-op-overhead bound, not
FLOP bound (BASELINE_MEASURED.md). Merging replaces ~3 forward + 2 backward
chains of small matmuls with 1 forward + 1 backward chain of slightly larger
ones — about half the sequential op count. The measured Jacobi-only variant
showed chain *independence* alone buys nothing (XLA runs the fused program's
ops sequentially); this is the fusion that independence enables.

Numerics: identical to the Jacobi path up to f32 matmul reassociation (same
RNG streams, same sampling, same losses, same update order). The replay
resample consumes the same pre-drawn Gumbel noise; top-k selection can only
differ on exact floating-point ties.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.onf import ONFConfig
from ..ops.losses import (
    boundary_loss,
    direction_constraint_deltas,
    distance_loss_se2,
    non_holonomic_constraint_deltas,
    softplus_beta,
)
from ..ops.math import wrap_angle
from ..ops.sampling import gumbel_topk_log_indices
from ..solver.field import field_sample_pre

__all__ = [
    "ONFActs",
    "onf_forward_acts",
    "onf_backward",
    "merged_partial_step",
    "merged_field_and_trajectory",
]


class ONFActs(NamedTuple):
    """Saved activations of one ONF forward pass (inputs to every matmul)."""

    xy: jnp.ndarray  # [M, 2] normalized positions
    enc: jnp.ndarray  # [M, F] Fourier features
    trig_e: jnp.ndarray  # [M, F] d enc / d pre_e
    ang: jnp.ndarray | None  # [M, 2H] angle features
    trig_a: jnp.ndarray | None  # [M, 2H] d ang / d a
    h1: jnp.ndarray  # [M, hid]
    h2: jnp.ndarray  # [M, hid]
    logits: jnp.ndarray  # [M, 1]


def _mm(a: jnp.ndarray, w: jnp.ndarray, compute: jnp.dtype) -> jnp.ndarray:
    """[M, K] @ [K, N] in the compute dtype with f32 accumulation (matches
    models/onf.py::onf_apply's matmul discipline)."""
    return jax.lax.dot_general(
        a.astype(compute), w.astype(compute),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _mmT(a: jnp.ndarray, b: jnp.ndarray, compute: jnp.dtype) -> jnp.ndarray:
    """a^T @ b contracting over rows: [M, K]^T @ [M, N] -> [K, N]."""
    return jax.lax.dot_general(
        a.astype(compute), b.astype(compute),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _angle_freqs(config: ONFConfig) -> jnp.ndarray:
    f = jnp.arange(1, config.angle_harmonics + 1, dtype=jnp.float32)
    return jnp.concatenate([f, f])


def onf_forward_acts(params: dict, x: jnp.ndarray, config: ONFConfig) -> ONFActs:
    """Concat-free ONF forward (models/onf.py::onf_apply) that also returns the
    activations the backward pass needs."""
    compute = jnp.dtype(config.compute_dtype)
    fourier = config.fourier_features
    hid = config.hidden

    xy = (x[:, :2] - config.mean) / config.sigma
    pre_e = _mm(xy, params["encoding"]["w"], compute)
    if config.bias:  # bias=False: no trainable bias (models/onf.py::onf_apply)
        pre_e = pre_e + params["encoding"]["b"]
    if config.use_cos:
        h = fourier // 2
        enc = jnp.concatenate([jnp.sin(pre_e[:, :h]), jnp.cos(pre_e[:, h:])], axis=1)
        trig_e = jnp.concatenate([jnp.cos(pre_e[:, :h]), -jnp.sin(pre_e[:, h:])], axis=1)
    else:
        enc = jnp.sin(pre_e)
        trig_e = jnp.cos(pre_e)

    w1 = params["mlp1"]["w"]
    w3 = params["out"]["w"]
    if config.angle_encoding:
        hh = config.angle_harmonics
        a = (x[:, 2][:, None] + params["angle_biases"][None, :]) * _angle_freqs(config)[None, :]
        ang = jnp.concatenate([jnp.sin(a[:, :hh]), jnp.cos(a[:, hh:])], axis=1)
        trig_a = jnp.concatenate([jnp.cos(a[:, :hh]), -jnp.sin(a[:, hh:])], axis=1)
        pre1 = _mm(enc, w1[:fourier], compute) + _mm(ang, w1[fourier:], compute) + params["mlp1"]["b"]
    else:
        ang = trig_a = None
        pre1 = _mm(enc, w1, compute) + params["mlp1"]["b"]
    h1 = jax.nn.relu(pre1)
    h2 = jax.nn.relu(_mm(h1, params["mlp2"]["w"], compute) + params["mlp2"]["b"])
    logits = _mm(h2, w3[:hid], compute) + _mm(enc, w3[hid : hid + fourier], compute) + params["out"]["b"]
    if ang is not None:
        logits = logits + _mm(ang, w3[hid + fourier :], compute)
    return ONFActs(xy, enc, trig_e, ang, trig_a, h1, h2, logits)


def onf_backward(
    params: dict,
    acts: ONFActs,
    g: jnp.ndarray,
    param_rows: int,
    config: ONFConfig,
) -> tuple[dict, jnp.ndarray]:
    """One backward chain with a row-split cotangent.

    `g` [M, 1] is the logit cotangent for ALL rows. Parameter gradients sum
    over rows [:param_rows] only (the field-training slice — rows past it have
    the field frozen, ref nerf_opt_planner.py:144); position gradients are
    returned for rows [param_rows:] only (the trajectory collision slice).
    Rows are independent through the MLP, so the shared hidden-cotangent chain
    is exact for both.

    Returns `(field_grads, pos_grads[M - param_rows, 3])` where field_grads
    matches the `init_onf_params` pytree (verified against jax.grad in
    tests/test_merged_step.py). With angle_encoding off, the theta column of
    pos_grads is zero (the field never reads theta).
    """
    compute = jnp.dtype(config.compute_dtype)
    fourier = config.fourier_features
    hid = config.hidden
    p = param_rows
    w1 = params["mlp1"]["w"]
    w2 = params["mlp2"]["w"]
    w3 = params["out"]["w"]

    gh2 = _mm(g, w3[:hid].T, compute)
    gpre2 = gh2 * (acts.h2 > 0)
    gh1 = _mm(gpre2, w2.T, compute)
    gpre1 = gh1 * (acts.h1 > 0)
    genc = _mm(gpre1, w1[:fourier].T, compute) + _mm(g, w3[hid : hid + fourier].T, compute)
    gpre_e = genc * acts.trig_e

    grads = {
        "encoding": {
            "w": _mmT(acts.xy[:p], gpre_e[:p], compute),
            # matches autodiff of the gated forward: unused bias -> zero grad
            "b": jnp.sum(gpre_e[:p], axis=0) if config.bias
            else jnp.zeros_like(params["encoding"]["b"]),
        },
        "mlp2": {
            "w": _mmT(acts.h1[:p], gpre2[:p], compute),
            "b": jnp.sum(gpre2[:p], axis=0),
        },
    }
    if config.angle_encoding:
        gang = _mm(gpre1, w1[fourier:].T, compute) + _mm(g, w3[hid + fourier :].T, compute)
        ga_freq = (gang * acts.trig_a) * _angle_freqs(config)[None, :]
        grads["angle_biases"] = jnp.sum(ga_freq[:p], axis=0)
        grads["mlp1"] = {
            "w": jnp.concatenate(
                [_mmT(acts.enc[:p], gpre1[:p], compute), _mmT(acts.ang[:p], gpre1[:p], compute)]
            ),
            "b": jnp.sum(gpre1[:p], axis=0),
        }
        grads["out"] = {
            "w": jnp.concatenate(
                [
                    _mmT(acts.h2[:p], g[:p], compute),
                    _mmT(acts.enc[:p], g[:p], compute),
                    _mmT(acts.ang[:p], g[:p], compute),
                ]
            ),
            "b": jnp.sum(g[:p], axis=0),
        }
        gtheta = jnp.sum(ga_freq[p:], axis=1)
    else:
        grads["mlp1"] = {
            "w": _mmT(acts.enc[:p], gpre1[:p], compute),
            "b": jnp.sum(gpre1[:p], axis=0),
        }
        grads["out"] = {
            "w": jnp.concatenate(
                [_mmT(acts.h2[:p], g[:p], compute), _mmT(acts.enc[:p], g[:p], compute)]
            ),
            "b": jnp.sum(g[:p], axis=0),
        }
        gtheta = jnp.zeros(g.shape[0] - p, jnp.float32)

    gxy = _mm(gpre_e[p:], params["encoding"]["w"].T, compute) / config.sigma
    pos_grads = jnp.concatenate([gxy, gtheta[:, None]], axis=1)
    return grads, pos_grads


def merged_partial_step(
    solver,  # ConstrainedSolver
    state,  # ConstrainedState
    oracle_params: Any,
    k_field: jax.Array,
    k_traj: jax.Array,
):
    """The merged step minus the field Adam update.

    Returns `(state, field_grads, field_loss, trajectory_loss)` where `state`
    already carries the trajectory/multiplier/buffer updates but the ENTRY
    field params. The caller applies the field optimizer — directly
    (`merged_field_and_trajectory`) or after group-averaging the grads
    (shared-field mode, `ConstrainedSolver._step_grouped`).
    """
    cfg = solver.config
    n = cfg.trajectory_length
    s = cfg.collision_samples_per_segment
    traj = state.trajectory

    # --- all random draws (identical streams to the separate-pass paths)
    pre = field_sample_pre(cfg, k_field, state.prev_trajectory, state.bounds)
    t = jax.random.uniform(k_traj, (n - 1, s), jnp.float32)

    # --- point assembly: [coarse | candidates | random | collision samples]
    candidates = jnp.concatenate([state.buffer_points, pre.fine], axis=0)
    cand_ages = jnp.concatenate(
        [state.buffer_ages, jnp.zeros(pre.fine.shape[0], state.buffer_ages.dtype)]
    )
    delta = traj[:-1] - traj[1:]
    delta = delta.at[:, 2].set(wrap_angle(delta[:, 2]))
    colpos = (traj[1:, None, :] + t[:, :, None] * delta[:, None, :]).reshape(-1, 3)
    m_interp = (
        state.collision_multipliers[1:, None] * (1.0 - t)
        + state.collision_multipliers[:-1, None] * t
    ).reshape(-1)

    n_coarse = n - 1
    n_cand = candidates.shape[0]
    n_rand = pre.random_points.shape[0]
    p = n_coarse + n_cand + n_rand  # param-grad (training-superset) rows

    pts = jnp.concatenate([pre.coarse, candidates, pre.random_points, colpos], axis=0)
    acts = onf_forward_acts(state.field_params, pts, cfg.onf)
    logits = acts.logits[:, 0]

    # --- replay-buffer resample from the candidate slice (field.py semantics)
    cand_logits = logits[n_coarse : n_coarse + n_cand]
    log_w = jax.nn.log_sigmoid(cand_logits) - cand_ages * cfg.buffer_age_decay
    idx = gumbel_topk_log_indices(log_w, pre.gumbel, cfg.collision_point_count)
    new_buffer = candidates[idx]
    new_ages = cand_ages[idx] + 1.0

    # --- BCE cotangent over the training superset, masked to the reference
    # train set [coarse, resampled buffer, random] (selection mask instead of
    # an activation gather; per-row BCE makes them identical)
    truth = solver.oracle_fn(oracle_params, pts[:p]).astype(jnp.float32)
    selected = jnp.zeros((n_cand,), jnp.float32).at[idx].set(1.0)
    mask = jnp.concatenate(
        [jnp.ones(n_coarse, jnp.float32), selected, jnp.ones(n_rand, jnp.float32)]
    )
    n_train = cfg.field_batch_size
    lt = logits[:p]
    g_bce = mask * (jax.nn.sigmoid(lt) - truth) / n_train
    per_row = jnp.maximum(lt, 0.0) - lt * truth + jnp.log1p(jnp.exp(-jnp.abs(lt)))
    field_loss = jnp.sum(per_row * mask) / n_train

    # --- collision cotangent (softplus_beta' = sigmoid(beta x); tanh' = 1-tanh^2)
    lc = logits[p:]
    tanh_lc = jnp.tanh(lc)
    g_col = (
        cfg.collision_weight * jax.nn.sigmoid(cfg.collision_beta * lc)
        + m_interp * (1.0 - tanh_lc**2)
    ) / s

    g = jnp.concatenate([g_bce, g_col])[:, None]
    field_grads, pos_g = onf_backward(state.field_params, acts, g, p, cfg.onf)

    # --- remaining (field-free) trajectory terms via autodiff
    def rest_loss(trajectory, cons_mult):
        full = jnp.concatenate([state.start[None], trajectory, state.goal[None]], axis=0)
        cd = non_holonomic_constraint_deltas(full)
        dd = jnp.maximum(direction_constraint_deltas(full), 0.0)
        return (
            distance_loss_se2(full, cfg.angle_weight)
            + jnp.sum(cons_mult * cd)
            + jnp.sum(cd**2) * cfg.constraint_deltas_weight
            + boundary_loss(trajectory, state.bounds) * cfg.boundary_weight
            + cfg.direction_delta_weight * jnp.sum(dd**2)
        )

    rest_val, (g_traj, g_cons) = jax.value_and_grad(rest_loss, argnums=(0, 1))(
        traj, state.constraint_multipliers
    )

    # --- chain collision-position/multiplier cotangents back through the
    # segment lerp colpos = (1-t)*traj[1:] + t*traj[:-1] (wrap has unit grad)
    pos_g = pos_g.reshape(n - 1, s, 3)
    g_traj = g_traj.at[1:].add(jnp.sum((1.0 - t)[..., None] * pos_g, axis=1))
    g_traj = g_traj.at[:-1].add(jnp.sum(t[..., None] * pos_g, axis=1))
    gm = (tanh_lc / s).reshape(n - 1, s)
    g_coll = (
        jnp.zeros(n, jnp.float32)
        .at[1:].add(jnp.sum((1.0 - t) * gm, axis=1))
        .at[:-1].add(jnp.sum(t * gm, axis=1))
    )
    traj_loss = rest_val + (
        cfg.collision_weight * jnp.sum(softplus_beta(lc, cfg.collision_beta))
        + jnp.sum(m_interp * tanh_lc)
    ) / s

    # --- primal step (H^-1-preconditioned Adam) + dual ascent, ref order
    traj_grad = solver._inv_hessian @ g_traj
    updates, traj_opt_state = solver._traj_opt.update(traj_grad, state.traj_opt_state, traj)
    new_traj = optax.apply_updates(traj, updates)
    cons_mult = state.constraint_multipliers + cfg.multipliers_lr * g_cons
    coll_mult = jnp.maximum(
        state.collision_multipliers + cfg.collision_multipliers_lr * g_coll, 0.0
    )

    state = state._replace(
        trajectory=new_traj,
        traj_opt_state=traj_opt_state,
        constraint_multipliers=cons_mult,
        collision_multipliers=coll_mult,
        buffer_points=new_buffer,
        buffer_ages=new_ages,
        prev_trajectory=traj,
    )
    return state, field_grads, field_loss, traj_loss


def merged_field_and_trajectory(
    solver,  # ConstrainedSolver
    state,  # ConstrainedState
    oracle_params: Any,
    k_field: jax.Array,
    k_traj: jax.Array,
):
    """Field update + trajectory update + dual ascent, through one fused ONF
    pass (see module docstring). Drop-in replacement for the Jacobi branch of
    `ConstrainedSolver._field_and_trajectory`: same RNG stream consumption,
    same update order, same returned `(state, field_loss, trajectory_loss)`.
    """
    state, field_grads, field_loss, traj_loss = merged_partial_step(
        solver, state, oracle_params, k_field, k_traj
    )
    f_updates, field_opt_state = solver._field_opt.update(
        field_grads, state.field_opt_state, state.field_params
    )
    field_params = optax.apply_updates(state.field_params, f_updates)
    state = state._replace(field_params=field_params, field_opt_state=field_opt_state)
    return state, field_loss, traj_loss
