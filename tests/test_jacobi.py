"""Jacobi step order: trajectory update reads the entry (one-update-stale)
field params, cutting the serial field->trajectory dependency chain in the
scan body (experimental.ExperimentalConstrainedSolver(jacobi_step=True)).

Invariants tested:
- the field sub-update is bit-identical to the default (Gauss-Seidel) order
  after one step: field grads depend only on the entry state and the field
  key, which the reordering does not touch (incl. prev_trajectory pinning);
- the trajectory differs (it saw stale field params);
- full solves stay finite and converge on the car scene;
- the grouped (shared-field) path supports the same flag.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.experimental import ExperimentalConstrainedSolver
from nfopp_tpu.models import ONFConfig
from nfopp_tpu.parallel import BatchPlanner, problem_mesh
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig, run_planner_config
from nfopp_tpu.worlds import (
    RectangleOracle,
    car_environment,
    circle_collision,
    CircleOracle,
    pad_obstacle_points,
    rectangle_collision,
    two_walls_se2_environment,
)


def make_pair(**cfg_kwargs):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    base = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3, **cfg_kwargs,
    )
    gs = ConstrainedSolver(base, circle_collision)
    jc = ExperimentalConstrainedSolver(base, circle_collision, jacobi_step=True)
    state = gs.init_state(
        jax.random.PRNGKey(0), env.start, env.goal,
        jnp.asarray(env.bounds, jnp.float32), oracle,
    )
    return gs, jc, state, oracle


class TestJacobiStep:
    def test_field_update_identical_trajectory_differs(self):
        gs, jc, state, oracle = make_pair()
        s_gs, _ = jax.jit(gs.step)(state, oracle)
        s_jc, _ = jax.jit(jc.step)(state, oracle)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_gs.field_params),
            jax.tree_util.tree_leaves(s_jc.field_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(s_gs.buffer_points), np.asarray(s_jc.buffer_points)
        )
        np.testing.assert_array_equal(
            np.asarray(s_gs.prev_trajectory), np.asarray(s_jc.prev_trajectory)
        )
        assert not np.allclose(
            np.asarray(s_gs.trajectory), np.asarray(s_jc.trajectory)
        )

    def test_run_finite(self):
        gs, jc, state, oracle = make_pair()
        out, aux = jax.jit(lambda s, o: jc.run(s, o, 40))(state, oracle)
        assert np.isfinite(np.asarray(out.trajectory)).all()
        assert np.isfinite(np.asarray(aux.field_loss)).all()
        assert aux.trajectory_loss.shape == (40,)

    def test_car_scene_converges(self):
        env = car_environment()
        pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
        oracle = RectangleOracle(
            jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
            jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
        )
        solver = ExperimentalConstrainedSolver(
            run_planner_config(), rectangle_collision, jacobi_step=True
        )
        state = solver.init_state(
            jax.random.PRNGKey(0), env.start, env.goal,
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
        state, _ = jax.jit(lambda s, o: solver.run(s, o, 1000))(state, oracle)
        path = np.asarray(solver.full_trajectory(state))
        dense = np.concatenate(
            [np.linspace(path[i], path[i + 1], 5, endpoint=False)
             for i in range(len(path) - 1)]
        )
        hits = np.asarray(
            rectangle_collision(oracle, jnp.asarray(dense, jnp.float32))
        )
        assert hits.mean() == 0.0

    def test_grouped_jacobi(self):
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
        solver = ExperimentalConstrainedSolver(cfg, circle_collision, jacobi_step=True)
        batch = 8
        starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
        goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
        bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
        )
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        states = planner.init_batch_grouped(
            jax.random.PRNGKey(1), starts, goals, bounds, oracles, group_size=4
        )
        states, _ = planner.run_grouped(states, oracles, 20, 4)
        for leaf in jax.tree_util.tree_leaves(states.field_params):
            arr = np.asarray(leaf)
            np.testing.assert_allclose(arr[0], arr[3], atol=1e-6)
        assert np.isfinite(np.asarray(states.trajectory)).all()
