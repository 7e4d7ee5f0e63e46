"""Experimental solver variants — TPU-falsified structural levers.

Every mode here was built, tested, and MEASURED SLOWER than the production
step on TPU v5e (full numbers: BASELINE_MEASURED.md "TPU throughput" table):

- use_fused_field_grad: fused Pallas field fwd+bwd kernels (20.5 vs 14.8 µs)
- jacobi_step: trajectory update reads the entry field params, cutting the
  field->trajectory serial chain (14.72 vs 14.26 µs — XLA does not exploit
  chain independence inside a scan body)
- merged_step: one fused ONF forward + hand-written backward covering
  candidate scoring, BCE training, and trajectory collision terms
  (17.50 vs 13.07 µs — the union batch beats every matmul it replaces and
  blocks XLA's own fusions)
- run_batch: P-problems-per-program Pallas kernels (19.9 µs at P=4; P=8
  exceeds the 16 MB VMEM scope in f32)

They are kept because (a) the numerics are pinned by tests — the measured
conclusions stay reproducible — and (b) the kernels are the right shape for
LARGE-M regimes (dense field evaluation, bigger fields) the production
workload does not hit. Support policy: this package is NOT part of the
stable API; it may change or disappear with the measurement story, and the
production solver never imports from it.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..solver.constrained import ConstrainedSolver, StepAux, _check_chunkable
from ..solver.field import field_sample_post, field_sample_pre
from ..solver.schedule import scan_chunked

__all__ = ["ExperimentalConstrainedSolver"]


class ExperimentalConstrainedSolver(ConstrainedSolver):
    """ConstrainedSolver with the falsified structural levers switchable.

    Flags are constructor kwargs (NOT SolverConfig fields — the production
    config stays clean): at most one of `jacobi_step`/`merged_step`;
    `use_fused_field_grad` composes with neither merged_step nor run_batch.
    """

    def __init__(self, config, oracle_fn, *, jacobi_step: bool = False,
                 merged_step: bool = False, use_fused_field_grad: bool = False):
        super().__init__(config, oracle_fn)
        if merged_step and jacobi_step:
            raise ValueError("jacobi_step and merged_step are mutually exclusive")
        if merged_step and use_fused_field_grad:
            raise ValueError(
                "merged_step and use_fused_field_grad are mutually exclusive"
            )
        if (jacobi_step or merged_step) and config.optimize_collision_model_freq != 1:
            raise NotImplementedError(
                "jacobi_step/merged_step require optimize_collision_model_freq == 1"
            )
        self.jacobi_step = jacobi_step
        self.merged_step = merged_step
        self.use_fused_field_grad = use_fused_field_grad
        if use_fused_field_grad:
            from .pallas.collision_terms import make_collision_terms

            self._collision_terms = make_collision_terms(
                config.onf, config.collision_beta,
                interpret=jax.default_backend() == "cpu",
            )

    # ------------------------------------------------- fused field kernels

    def _field_grads(self, state, oracle_params, key):
        if not self.use_fused_field_grad:
            return super()._field_grads(state, oracle_params, key)
        from .pallas.field_grad import field_loss_and_grad_fused
        from .pallas.onf_fused import onf_apply_fused_single
        from ..solver.field import sample_field_points

        cfg = self.config
        interpret = jax.default_backend() == "cpu"
        sample = sample_field_points(
            cfg, key, state.prev_trajectory, state.buffer_points,
            state.buffer_ages, state.field_params, state.bounds,
            score_fn=lambda params, pts: onf_apply_fused_single(
                params, pts, cfg.onf, interpret=interpret
            )[:, 0],
        )
        truth = self.oracle_fn(oracle_params, sample.train_points)
        loss, grads = field_loss_and_grad_fused(
            cfg.onf, state.field_params, sample.train_points, truth,
            interpret=interpret,
        )
        return sample, loss, grads

    # --------------------------------------------- jacobi / merged orders

    def _field_and_trajectory(self, state, oracle_params, k_field, k_traj,
                              with_field=None):
        if self.merged_step:
            from .merged_step import merged_field_and_trajectory

            return merged_field_and_trajectory(
                self, state, oracle_params, k_field, k_traj
            )
        if self.jacobi_step:
            prev_traj = state.trajectory
            sample, field_loss, grads = self._field_grads(
                state, oracle_params, k_field
            )
            state, traj_loss = self._trajectory_step(state, k_traj)
            state = self._apply_field_update(state, sample, grads)
            return state._replace(prev_trajectory=prev_traj), field_loss, traj_loss
        return super()._field_and_trajectory(
            state, oracle_params, k_field, k_traj, with_field
        )

    def _step_grouped(self, states, oracle_params, with_reparam, group_size,
                      with_field=True):
        if not (self.merged_step or self.jacobi_step):
            return super()._step_grouped(
                states, oracle_params, with_reparam, group_size, with_field
            )
        cfg = self.config
        if cfg.optimize_collision_model_freq != 1:
            raise NotImplementedError(
                "grouped jacobi/merged modes require "
                "optimize_collision_model_freq == 1"
            )
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
        states = states._replace(key=keys[:, 0])
        if not with_field:
            field_loss = jnp.zeros((states.trajectory.shape[0],), jnp.float32)
            states, traj_loss = jax.vmap(self._trajectory_step)(states, keys[:, 2])
        elif self.merged_step:
            # merged step (one fused ONF pass per problem), field grads
            # group-mean'd before the Adam update — same collective pattern
            # as the jacobi/default branches
            from .merged_step import merged_partial_step

            states, grads, field_loss, traj_loss = jax.vmap(
                lambda s, o, kf, kt: merged_partial_step(self, s, o, kf, kt)
            )(states, oracle_params, keys[:, 1], keys[:, 2])
            grads = jax.tree_util.tree_map(
                lambda g: self._group_mean(g, group_size), grads
            )
            updates, opt_state = jax.vmap(self._field_opt.update)(
                grads, states.field_opt_state, states.field_params
            )
            params = optax.apply_updates(states.field_params, updates)
            states = states._replace(field_params=params, field_opt_state=opt_state)
        else:
            # jacobi: trajectory update reads the entry field, cutting the
            # serial chain
            prev_traj = states.trajectory
            samples, field_loss, grads = self._field_grads_grouped(
                states, oracle_params, keys[:, 1], group_size
            )
            states, traj_loss = jax.vmap(self._trajectory_step)(states, keys[:, 2])
            states = jax.vmap(self._apply_field_update)(states, samples, grads)
            states = states._replace(prev_trajectory=prev_traj)
        if with_reparam:
            states = jax.vmap(self._reparametrize)(states)
        states = states._replace(step_count=states.step_count + 1)
        return states, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    # ------------------------------------------ batch-explicit fast path

    def _field_step_batch(self, states, oracle_params, keys, problems_per_program):
        """Field update for a whole batch with multi-problem Pallas kernels.

        Semantically identical to vmap(self._field_step) (same per-problem RNG
        stream consumption), but the two heavy passes — candidate scoring and
        training fwd+bwd — run as P-problems-per-program kernels instead of
        XLA's batched fusions.
        """
        cfg = self.config
        from .pallas.field_grad_multi import field_loss_and_grad_multi
        from .pallas.onf_multi import onf_apply_fused_multi

        interpret = jax.default_backend() == "cpu"

        pre = jax.vmap(field_sample_pre, in_axes=(None, 0, 0, 0))(
            cfg, keys, states.prev_trajectory, states.bounds
        )
        candidates = jnp.concatenate([states.buffer_points, pre.fine], axis=1)
        candidate_ages = jnp.concatenate(
            [states.buffer_ages, jnp.zeros(pre.fine.shape[:2], states.buffer_ages.dtype)],
            axis=1,
        )
        logits = onf_apply_fused_multi(
            states.field_params, candidates, cfg.onf,
            problems_per_program, interpret=interpret,
        )[..., 0]
        sample = jax.vmap(field_sample_post, in_axes=(None, 0, 0, 0, 0))(
            cfg, pre, logits, candidates, candidate_ages
        )
        new_buffer, new_ages, train_points = (
            sample.buffer_points, sample.buffer_ages, sample.train_points
        )
        truth = jax.vmap(self.oracle_fn)(oracle_params, train_points)
        loss, grads = field_loss_and_grad_multi(
            cfg.onf, states.field_params, train_points, truth,
            problems_per_program, interpret=interpret,
        )
        updates, opt_state = jax.vmap(self._field_opt.update)(
            grads, states.field_opt_state, states.field_params
        )
        params = optax.apply_updates(states.field_params, updates)
        return (
            states._replace(
                field_params=params,
                field_opt_state=opt_state,
                buffer_points=new_buffer,
                buffer_ages=new_ages,
                prev_trajectory=states.trajectory,
            ),
            loss,
        )

    def _step_batch(self, states, oracle_params, with_reparam: bool,
                    problems_per_program: int, with_field: bool = True):
        cfg = self.config
        keys = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
        states = states._replace(key=keys[:, 0])
        if cfg.optimize_collision_model_freq != 1 and self._static_field_stride() == 1:
            raise NotImplementedError(
                "batch-explicit path requires optimize_collision_model_freq == 1 "
                "or one that divides reparametrize_trajectory_freq"
            )
        if with_field:
            states, field_loss = self._field_step_batch(
                states, oracle_params, keys[:, 1], problems_per_program
            )
        else:
            field_loss = jnp.zeros((states.trajectory.shape[0],), jnp.float32)
        states, traj_loss = jax.vmap(self._trajectory_step)(states, keys[:, 2])
        if with_reparam:
            states = jax.vmap(self._reparametrize)(states)
        states = states._replace(step_count=states.step_count + 1)
        return states, StepAux(field_loss=field_loss, trajectory_loss=traj_loss)

    def run_batch(self, states, oracle_params, num_steps: int,
                  problems_per_program: int = 8):
        """Batch-explicit `run`: multi-problem Pallas kernels for the field
        passes, vmap for the rest. Same statically-scheduled reparametrization
        chunking as `run`; requires num_steps % reparametrize_trajectory_freq
        == 0 and batch % problems_per_program == 0.

        Like `run`'s static path, the schedule REQUIRES step_count % freq == 0
        on entry (true after init_state / update_*; preserved across calls
        with multiple-of-freq lengths). There is no allow_static escape here —
        stateful callers that may enter misaligned must realign (re-init) or
        use `run(..., allow_static=False)` per problem; entering misaligned
        silently trains the field and reparametrizes at the wrong steps.
        """
        freq = self.config.reparametrize_trajectory_freq
        _check_chunkable("run_batch", num_steps, freq)
        states, aux = scan_chunked(
            lambda s, r, f: self._step_batch(s, oracle_params, r,
                                             problems_per_program, with_field=f),
            states, num_steps, freq,
            self.config.scan_unroll, self.config.outer_scan_unroll,
            field_stride=self._static_field_stride(),
        )
        # [chunks, freq, B] -> [B, steps] to match vmap(run)'s layout
        aux = jax.tree_util.tree_map(
            lambda x: jnp.moveaxis(x.reshape((num_steps,) + x.shape[2:]), 0, 1), aux
        )
        return states, aux
