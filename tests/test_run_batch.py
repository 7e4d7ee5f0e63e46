"""Batch-explicit run (multi-problem Pallas kernels) vs the vmapped path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.experimental import ExperimentalConstrainedSolver
from nfopp_tpu.models import ONFConfig
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def test_run_batch_matches_vmapped_run():
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
    )
    solver = ExperimentalConstrainedSolver(cfg, circle_collision)
    batch = 4
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.vmap(
        lambda k: solver.init_state(
            k, jnp.asarray(env.start), jnp.asarray(env.goal),
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
    )(keys)
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    ref, ref_aux = jax.jit(
        lambda s, o: jax.vmap(solver.run, in_axes=(0, 0, None))(s, o, 10)
    )(states, oracles)
    got, got_aux = jax.jit(
        lambda s, o: solver.run_batch(s, o, 10, problems_per_program=2)
    )(states, oracles)
    np.testing.assert_allclose(
        np.asarray(got.trajectory), np.asarray(ref.trajectory), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_aux.field_loss), np.asarray(ref_aux.field_loss), atol=1e-5
    )
    assert got_aux.trajectory_loss.shape == ref_aux.trajectory_loss.shape


def test_run_batch_validations():
    cfg = SolverConfig(trajectory_length=12, collision_point_count=12,
                       onf=ONFConfig(angle_encoding=True))
    solver = ExperimentalConstrainedSolver(cfg, circle_collision)
    with pytest.raises(ValueError, match="reparametrize"):
        solver.run_batch(None, None, 7)
