"""Shared-field group mode: one occupancy field per map group.

SURVEY.md §2 designs three communication jobs for the problem-batch mesh; job
(3) is optional shared-field updates between solves on the same map. These
tests cover: replica lockstep (fields identical within a group across steps,
distinct across groups), exact equivalence to the vmapped run at group_size=1,
cross-shard groups on the virtual 8-device mesh, and the shared-field
portfolio path.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.parallel import BatchPlanner, problem_mesh
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    car_environment,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def small_setup(batch, trajectory_length=12):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=trajectory_length, collision_point_count=12,
        random_field_points=4, onf=ONFConfig(angle_encoding=True),
        angle_offset=0.3,
    )
    solver = ConstrainedSolver(cfg, circle_collision)
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    return solver, starts, goals, bounds, oracles


def field_leaves(states):
    return jax.tree_util.tree_leaves(states.field_params)


class TestGroupedInit:
    def test_fields_identical_within_group_distinct_across(self):
        solver, starts, goals, bounds, oracles = small_setup(8)
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        states = planner.init_batch_grouped(
            jax.random.PRNGKey(0), starts, goals, bounds, oracles, group_size=4
        )
        for leaf in field_leaves(states):
            arr = np.asarray(leaf)
            np.testing.assert_array_equal(arr[0], arr[3])
            np.testing.assert_array_equal(arr[4], arr[7])
            assert not np.array_equal(arr[0], arr[4])
        # non-field state still differs within a group (own RNG streams)
        buf = np.asarray(states.buffer_points)
        assert not np.array_equal(buf[0], buf[1])

    def test_batch_not_divisible_raises(self):
        solver, starts, goals, bounds, oracles = small_setup(6)
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        with pytest.raises(ValueError, match="divisible"):
            planner.init_batch_grouped(
                jax.random.PRNGKey(0), starts, goals, bounds, oracles, group_size=4
            )

    def test_mixed_worlds_in_group_raises(self):
        solver, starts, goals, bounds, oracles = small_setup(8)
        oracles = oracles._replace(
            radius=oracles.radius.at[1].set(0.5)  # problem 1 gets another world
        )
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        with pytest.raises(ValueError, match="share one map"):
            planner.init_batch_grouped(
                jax.random.PRNGKey(0), starts, goals, bounds, oracles, group_size=4
            )

    def test_holonomic_solver_clean_error(self):
        from nfopp_tpu.solver import HolonomicSolver
        from nfopp_tpu.worlds import circle_collision

        solver, starts, goals, bounds, oracles = small_setup(4)
        holo = HolonomicSolver(
            solver.config._replace(onf=solver.config.onf._replace(angle_encoding=False)),
            circle_collision,
        )
        planner = BatchPlanner(holo, problem_mesh(jax.devices()[:1]))
        with pytest.raises(NotImplementedError, match="shared-field"):
            planner.init_batch_grouped(
                jax.random.PRNGKey(0), starts[:, :2], goals[:, :2], bounds,
                oracles, group_size=2,
            )


class TestRunGrouped:
    def test_lockstep_and_divergence(self):
        solver, starts, goals, bounds, oracles = small_setup(8)
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        states = planner.init_batch_grouped(
            jax.random.PRNGKey(1), starts, goals, bounds, oracles, group_size=4
        )
        states, aux = planner.run_grouped(states, oracles, 20, 4)
        for leaf in field_leaves(states):
            arr = np.asarray(leaf)
            np.testing.assert_allclose(arr[0], arr[3], atol=1e-6)
            assert not np.allclose(arr[0], arr[4])
        # trajectories stay per-problem
        traj = np.asarray(states.trajectory)
        assert not np.allclose(traj[0], traj[1])
        assert np.isfinite(traj).all()
        assert aux.trajectory_loss.shape == (8, 20)

    def test_group_size_one_matches_vmapped_run(self):
        solver, starts, goals, bounds, oracles = small_setup(4)
        keys = jax.random.split(jax.random.PRNGKey(2), 4)
        states = jax.vmap(
            lambda k, s, g, b, o: solver.init_state(k, s, g, b, o)
        )(keys, starts, goals, bounds, oracles)
        ref, _ = jax.jit(
            lambda s, o: jax.vmap(solver.run, in_axes=(0, 0, None))(s, o, 10)
        )(states, oracles)
        got, _ = jax.jit(
            lambda s, o: solver.run_grouped(s, o, 10, 1)
        )(states, oracles)
        np.testing.assert_allclose(
            np.asarray(got.trajectory), np.asarray(ref.trajectory), atol=1e-5
        )

    def test_cross_shard_groups_on_mesh(self):
        """A group spanning multiple devices: the reshape-mean compiles to a
        cross-shard collective and replicas stay in lockstep."""
        solver, starts, goals, bounds, oracles = small_setup(16)
        planner = BatchPlanner(solver, problem_mesh())  # all 8 CPU devices
        states = planner.init_batch_grouped(
            jax.random.PRNGKey(3), starts, goals, bounds, oracles, group_size=8
        )
        states, _ = planner.run_grouped(states, oracles, 10, 8)
        shard_devices = {s.device for s in states.trajectory.addressable_shards}
        assert len(shard_devices) == 8
        for leaf in field_leaves(states):
            arr = np.asarray(leaf)
            np.testing.assert_allclose(arr[0], arr[7], atol=1e-6)
            np.testing.assert_allclose(arr[8], arr[15], atol=1e-6)

    def test_validations(self):
        solver, starts, goals, bounds, oracles = small_setup(4)
        with pytest.raises(ValueError, match="reparametrize"):
            solver.run_grouped(None, None, 7, 2)


class TestSharedFieldPortfolio:
    def test_car_scene_feasible(self):
        env = car_environment()
        pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
        oracle = CircleOracle(
            jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.1),
            jnp.asarray(env.bounds, jnp.float32),
        )
        cfg = SolverConfig(
            trajectory_length=32, collision_point_count=32,
            onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
        )
        solver = ConstrainedSolver(cfg, circle_collision)
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        result = planner.solve_portfolio(
            jax.random.PRNGKey(0), env.start, env.goal, env.bounds, oracle,
            restarts=4, max_iterations=200, shared_field=True,
        )
        assert result.path.shape == (34, 3)
        assert np.isfinite(np.asarray(result.path)).all()
        assert int(result.iterations) == 200
