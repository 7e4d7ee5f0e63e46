"""Tests for solver-state checkpointing."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
from nfopp_tpu.solver.checkpoint import restore_state, save_state
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


@pytest.fixture(scope="module")
def solver_and_state():
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), circle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(0), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    return solver, state, oracle


def test_save_restore_roundtrip(solver_and_state, tmp_path):
    solver, state, oracle = solver_and_state
    advanced, _ = jax.jit(lambda s, o: solver.run(s, o, 25))(state, oracle)
    ckpt = save_state(advanced, tmp_path / "state.npz")
    restored = restore_state(state, ckpt)
    for a, b in zip(jax.tree_util.tree_leaves(advanced), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(solver_and_state, tmp_path):
    """50 straight steps == 25 steps -> checkpoint -> restore -> 25 steps."""
    solver, state, oracle = solver_and_state
    run25 = jax.jit(lambda s, o: solver.run(s, o, 25))
    straight, _ = run25(*run25(state, oracle)[:1], oracle)

    mid, _ = run25(state, oracle)
    ckpt = save_state(mid, tmp_path / "mid.npz")
    resumed, _ = run25(restore_state(state, ckpt), oracle)
    np.testing.assert_allclose(
        np.asarray(straight.trajectory), np.asarray(resumed.trajectory), atol=1e-6
    )


def test_batched_state_checkpoint(solver_and_state, tmp_path):
    solver, state, oracle = solver_and_state
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)
    ckpt = save_state(batch, tmp_path / "batch.npz")
    restored = restore_state(batch, ckpt)
    assert restored.trajectory.shape == (2, 100, 3)


def test_shape_mismatch_raises(solver_and_state, tmp_path):
    solver, state, oracle = solver_and_state
    ckpt = save_state(state, tmp_path / "s.npz")
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), state)
    with pytest.raises(ValueError, match="shape"):
        restore_state(batch, ckpt)
