"""Batched, mesh-sharded planning: solve thousands of NFOPP problems at once.

This is the scale-out layer the reference lacks entirely (SURVEY.md §2:
single device, single trajectory, single field). `BatchPlanner` vmaps the
solver over a problem batch and shards the batch axis over a device mesh;
XLA partitions every step along that axis with zero hot-loop communication.
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..solver.tracking import TrackingResult, evaluate_path, run_with_tracking
from .mesh import batch_sharding, problem_mesh, shard_batch

__all__ = ["BatchPlanner"]


class BatchPlanner:
    """Vectorized front end over a `ConstrainedSolver`/`HolonomicSolver`.

    All array arguments carry a leading batch axis; oracle parameters are
    batched too (per-problem worlds). `mesh=None` builds a 1-D mesh over all
    visible devices. Batch size must be divisible by the mesh size.
    """

    def __init__(self, solver, mesh: Mesh | None = None):
        self.solver = solver
        self.mesh = mesh if mesh is not None else problem_mesh()
        self._sharding = batch_sharding(self.mesh)

        self._init = jax.jit(
            jax.vmap(lambda k, s, g, b, o: solver.init_state(k, s, g, b, o)),
            out_shardings=self._sharding,
        )
        self._init_with_traj = jax.jit(
            jax.vmap(
                lambda k, s, g, b, o, t: solver.init_state(k, s, g, b, o, trajectory=t)
            ),
            out_shardings=self._sharding,
        )
        self._init_grouped = jax.jit(
            jax.vmap(
                lambda k, fk, s, g, b, o: solver.init_state(k, s, g, b, o, field_key=fk)
            ),
            out_shardings=self._sharding,
        )
        self._run = jax.jit(
            jax.vmap(solver.run, in_axes=(0, 0, None)),
            static_argnums=2,
            out_shardings=self._sharding,
        )
        self._run_grouped = None
        if hasattr(solver, "run_grouped"):
            self._run_grouped = jax.jit(
                solver.run_grouped, static_argnums=(2, 3),
                out_shardings=self._sharding,
            )
        self._track = jax.jit(
            jax.vmap(
                partial(run_with_tracking, solver), in_axes=(0, 0, None, None, None)
            ),
            static_argnums=(2, 3, 4),
            out_shardings=self._sharding,
        )

    def init_batch(
        self,
        key: jax.Array,
        starts: jnp.ndarray,
        goals: jnp.ndarray,
        bounds: jnp.ndarray,
        oracle_params: Any,
        trajectories: jnp.ndarray | None = None,
    ) -> Any:
        """Build a sharded batch of solver states.

        `key` is a single PRNG key (split per problem) or a [B]-batch of keys.
        `trajectories` [B, N, d] optionally overrides the straight-line
        initializer (e.g. batched wavefront A* paths).
        """
        batch = starts.shape[0]
        if key.ndim == 1:
            keys = jax.random.split(key, batch)
        else:
            keys = key
        args = (keys, starts, goals, bounds)
        args = tuple(shard_batch(jnp.asarray(a), self.mesh) for a in args)
        oracle_params = shard_batch(oracle_params, self.mesh)
        if trajectories is None:
            return self._init(*args, oracle_params)
        trajectories = shard_batch(jnp.asarray(trajectories), self.mesh)
        return self._init_with_traj(*args, oracle_params, trajectories)

    def init_batch_grouped(
        self,
        key: jax.Array,
        starts: jnp.ndarray,
        goals: jnp.ndarray,
        bounds: jnp.ndarray,
        oracle_params: Any,
        group_size: int,
    ) -> Any:
        """Sharded batch where each group of `group_size` consecutive problems
        shares one field_key — the entry point for shared-field solving
        (identical initial field replicas per group; run_grouped keeps them in
        lockstep)."""
        batch = starts.shape[0]
        if batch % group_size != 0:
            raise ValueError(f"batch {batch} not divisible by group {group_size}")
        k_problems, k_fields = jax.random.split(key)
        keys = jax.random.split(k_problems, batch)
        field_keys = jnp.repeat(
            jax.random.split(k_fields, batch // group_size), group_size, axis=0
        )
        args = (keys, field_keys, starts, goals, bounds)
        args = tuple(shard_batch(jnp.asarray(a), self.mesh) for a in args)
        oracle_params = shard_batch(oracle_params, self.mesh)
        return self._init_grouped(*args, oracle_params)

    def run(self, states: Any, oracle_params: Any, num_steps: int):
        """Advance every problem `num_steps` steps; returns (states, aux)."""
        return self._run(states, oracle_params, num_steps)

    def run_grouped(self, states: Any, oracle_params: Any, num_steps: int,
                    group_size: int):
        """Advance with one shared field per problem group (see
        ConstrainedSolver.run_grouped)."""
        if self._run_grouped is None:
            raise NotImplementedError("solver has no shared-field mode")
        return self._run_grouped(states, oracle_params, num_steps, group_size)

    def solve(
        self,
        states: Any,
        oracle_params: Any,
        max_iterations: int = 1000,
        min_iterations: int = 200,
        check_freq: int = 50,
    ) -> TrackingResult:
        """Benchmark-mode solve with per-problem best-path tracking/early stop
        (scripts/run_bench_mr.py semantics, batched)."""
        return self._track(
            states, oracle_params, max_iterations, min_iterations, check_freq
        )

    def paths(self, states: Any) -> jnp.ndarray:
        """[B, N+2, d] full trajectories with pinned endpoints."""
        return jax.vmap(self.solver.full_trajectory)(states)

    def solve_portfolio(
        self,
        key: jax.Array,
        start: jnp.ndarray,
        goal: jnp.ndarray,
        bounds: jnp.ndarray,
        oracle_params: Any,
        restarts: int = 8,
        max_iterations: int = 1000,
        min_iterations: int = 200,
        check_freq: int = 50,
        shared_field: bool = False,
    ) -> TrackingResult:
        """Portfolio solving: one problem, `restarts` random restarts in a
        single sharded batch; returns the best feasible result.

        The NFOPP objective is nonconvex and chaotic in its RNG stream (the
        reference's own demo scene fails or succeeds depending on seed) — on
        TPU, restarts are nearly free: they ride the same batch machinery as
        independent problems. This capability has no reference counterpart.

        shared_field=True trains ONE occupancy field from all restarts'
        samples (run_grouped): the field sees restarts x points per step, the
        trajectories stay independent. No per-problem early stop in this mode
        (the full budget runs; evaluation happens at the end).
        """
        tile = lambda x: jnp.tile(jnp.asarray(x)[None], (restarts,) + (1,) * jnp.ndim(x))
        starts = tile(jnp.asarray(start, jnp.float32))
        goals = tile(jnp.asarray(goal, jnp.float32))
        bounds_b = tile(jnp.asarray(bounds, jnp.float32))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (restarts,) + (1,) * x.ndim), oracle_params
        )
        if shared_field:
            states = self.init_batch_grouped(
                key, starts, goals, bounds_b, oracles, group_size=restarts
            )
            states, _ = self.run_grouped(states, oracles, max_iterations, restarts)
            path = self.paths(states)
            collides, length = jax.jit(
                jax.vmap(lambda o, p: evaluate_path(self.solver.oracle_fn, o, p))
            )(oracles, path)
            result = TrackingResult(
                state=states,
                path=path,
                length=length,
                feasible=~collides,
                iterations=jnp.full(restarts, max_iterations, jnp.int32),
            )
        else:
            states = self.init_batch(key, starts, goals, bounds_b, oracles)
            result = self.solve(states, oracles, max_iterations, min_iterations, check_freq)
        feasible = result.feasible
        # rank: feasible first, then shortest
        score = jnp.where(feasible, result.length, jnp.inf)
        best = jnp.argmin(score)
        pick = lambda x: jax.tree_util.tree_map(lambda v: v[best], x)
        return TrackingResult(
            state=pick(result.state),
            path=result.path[best],
            length=result.length[best],
            feasible=result.feasible[best],
            iterations=result.iterations[best],
        )
