"""Multi-device tests on the virtual 8-device CPU mesh: sharded batch solving."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.parallel import BatchPlanner, mean_over_problems, problem_mesh, shard_batch
from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def batched_oracle(env, batch, capacity=32, radius=0.3):
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), capacity)
    oracle = CircleOracle(
        points=jnp.asarray(pts),
        mask=jnp.asarray(mask),
        radius=jnp.float32(radius),
        bounds=jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    return jax.tree_util.tree_map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle)


@pytest.fixture(scope="module")
def planner_and_batch():
    env = two_walls_se2_environment()
    solver = ConstrainedSolver(run_planner_config(), circle_collision)
    mesh = problem_mesh()
    planner = BatchPlanner(solver, mesh)
    batch = 16
    oracles = batched_oracle(env, batch)
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    states = planner.init_batch(jax.random.PRNGKey(0), starts, goals, bounds, oracles)
    return planner, states, oracles, batch


def test_mesh_spans_all_devices():
    mesh = problem_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8


def test_init_batch_is_sharded(planner_and_batch):
    planner, states, _, batch = planner_and_batch
    assert states.trajectory.shape == (batch, 100, 3)
    shard_devices = {s.device for s in states.trajectory.addressable_shards}
    assert len(shard_devices) == 8  # spread over every device


def test_batched_run_advances_all_problems(planner_and_batch):
    planner, states, oracles, batch = planner_and_batch
    out, aux = planner.run(states, oracles, 30)
    assert aux.trajectory_loss.shape == (batch, 30)
    assert np.isfinite(np.asarray(aux.trajectory_loss)).all()
    assert (np.asarray(out.step_count) == 30).all()
    # per-problem RNG: different problems evolve differently
    t = np.asarray(out.trajectory)
    assert not np.allclose(t[0], t[1])
    # output stays sharded across the mesh
    assert len({s.device for s in out.trajectory.addressable_shards}) == 8


def test_sharded_matches_single_device(planner_and_batch):
    """Sharding must not change semantics: compare one problem's result
    computed in the sharded batch vs standalone on one device."""
    planner, states, oracles, _ = planner_and_batch
    out, _ = planner.run(states, oracles, 10)

    solver = planner.solver
    single_state = jax.tree_util.tree_map(lambda x: np.asarray(x)[0], states)
    single_oracle = jax.tree_util.tree_map(lambda x: jnp.asarray(np.asarray(x)[0]), oracles)
    single_state = jax.tree_util.tree_map(jnp.asarray, single_state)
    ref, _ = jax.jit(lambda s, o: solver.run(s, o, 10))(single_state, single_oracle)
    np.testing.assert_allclose(
        np.asarray(out.trajectory)[0], np.asarray(ref.trajectory), atol=2e-5
    )


def test_metric_reduction_over_shards(planner_and_batch):
    planner, states, oracles, _ = planner_and_batch
    _, aux = planner.run(states, oracles, 5)
    mean_loss = jax.jit(mean_over_problems)(aux.trajectory_loss[:, -1])
    assert np.isfinite(float(mean_loss))


def test_heterogeneous_problems(planner_and_batch):
    """Different starts/goals per problem in one sharded batch."""
    planner, _, oracles, batch = planner_and_batch
    env = two_walls_se2_environment()
    rng = np.random.RandomState(0)
    starts = np.tile(env.start[None], (batch, 1)).astype(np.float32)
    goals = np.tile(env.goal[None], (batch, 1)).astype(np.float32)
    starts[:, :2] += rng.uniform(-0.2, 0.2, (batch, 2))
    goals[:, :2] += rng.uniform(-0.2, 0.2, (batch, 2))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    states = planner.init_batch(
        jax.random.PRNGKey(3), jnp.asarray(starts), jnp.asarray(goals), bounds, oracles
    )
    paths = np.asarray(planner.paths(states))
    np.testing.assert_allclose(paths[:, 0], starts, atol=1e-6)
    np.testing.assert_allclose(paths[:, -1], goals, atol=1e-6)
