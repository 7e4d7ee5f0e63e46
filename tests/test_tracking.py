"""Tests for the benchmark-mode tracking loop (run_bench_mr.py semantics)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
from nfopp_tpu.solver.tracking import evaluate_path, run_with_tracking
from nfopp_tpu.worlds import (
    RectangleOracle,
    car_environment,
    pad_obstacle_points,
    rectangle_collision,
)


@pytest.fixture(scope="module")
def setup():
    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts),
        jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), rectangle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(0), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    return solver, state, oracle, env


def test_evaluate_path_straight_line_free(setup):
    solver, state, oracle, env = setup
    path = jnp.asarray(
        np.stack(
            [np.linspace(0.2, 0.8, 10), np.linspace(0.2, 0.8, 10), np.zeros(10)], axis=1
        ),
        jnp.float32,
    )
    collides, length = evaluate_path(rectangle_collision, oracle, path)
    assert not bool(collides)
    np.testing.assert_allclose(float(length), np.sqrt(2) * 0.6, atol=1e-5)


def test_evaluate_path_detects_interpolated_collision(setup):
    """Two free waypoints whose connecting segment crosses a wall."""
    solver, state, oracle, env = setup
    path = jnp.asarray([[0.5, 2.65, 0.0], [3.0, 2.65, 0.0]], jnp.float32)
    # endpoints: left of wall x=1.6 slot and right of wall x=2.5 — the segment
    # crosses both walls around the parking slot
    collides, _ = evaluate_path(rectangle_collision, oracle, path, samples_per_segment=50)
    assert bool(collides)


def test_run_with_tracking_solves_car_scene(setup):
    solver, state, oracle, env = setup
    result = jax.jit(
        lambda s, o: run_with_tracking(solver, s, o, max_iterations=1000)
    )(state, oracle)
    assert bool(result.feasible)
    assert np.isfinite(float(result.length))
    assert int(result.iterations) <= 1000
    path = np.asarray(result.path)
    np.testing.assert_allclose(path[0], env.start, atol=1e-5)
    np.testing.assert_allclose(path[-1], env.goal, atol=1e-5)
    collides, _ = evaluate_path(rectangle_collision, oracle, result.path)
    assert not bool(collides)


def test_early_stop_saves_iterations(setup):
    """The car scene typically converges well before 1000 iterations; the
    while_loop must actually stop early."""
    solver, state, oracle, env = setup
    result = jax.jit(
        lambda s, o: run_with_tracking(solver, s, o, max_iterations=1000)
    )(state, oracle)
    assert int(result.iterations) < 1000


def test_tracking_vmapped(setup):
    solver, state, oracle, env = setup
    batch = 4
    keys = jax.random.split(jax.random.PRNGKey(5), batch)
    states = jax.vmap(
        lambda k: solver.init_state(
            k, jnp.asarray(env.start), jnp.asarray(env.goal), jnp.asarray(env.bounds), oracle
        )
    )(keys)
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    result = jax.jit(
        jax.vmap(lambda s, o: run_with_tracking(solver, s, o, max_iterations=600))
    )(states, oracles)
    assert result.path.shape == (batch, 102, 3)
    assert np.asarray(result.feasible).sum() >= 3  # solves reliably across seeds
    # per-problem early stop: iteration counts may differ between problems
    assert np.isfinite(np.asarray(result.length)).all()
