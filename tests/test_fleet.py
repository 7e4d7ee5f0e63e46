"""retarget (new query, same map, keep the field) and the fleet replanning
service (N robots, one map, one shared field, batched anytime cycles)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.service import FleetReplanningService
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    car_environment,
    circle_collision,
    pad_obstacle_points,
)


def car_oracle_solver(trajectory_length=16):
    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.1),
        jnp.asarray(env.bounds, jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=trajectory_length, collision_point_count=16,
        random_field_points=4, onf=ONFConfig(angle_encoding=True),
        angle_offset=0.3,
    )
    return env, oracle, ConstrainedSolver(cfg, circle_collision)


class TestRetarget:
    def test_keeps_field_resets_query(self):
        env, oracle, solver = car_oracle_solver()
        state = solver.init_state(
            jax.random.PRNGKey(0), env.start, env.goal,
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
        state, _ = jax.jit(lambda s, o: solver.run(s, o, 20))(state, oracle)
        new_start = jnp.asarray([2.5, 2.5, 0.0], jnp.float32)
        new_goal = jnp.asarray([0.5, 0.5, 0.0], jnp.float32)
        re = jax.jit(solver.retarget)(state, new_start, new_goal)
        # field + buffer untouched
        for a, b in zip(
            jax.tree_util.tree_leaves(state.field_params),
            jax.tree_util.tree_leaves(re.field_params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(state.buffer_points), np.asarray(re.buffer_points)
        )
        # query state rebuilt
        np.testing.assert_allclose(np.asarray(re.start), new_start)
        np.testing.assert_allclose(np.asarray(re.goal), new_goal)
        assert int(re.step_count) == 0
        assert float(jnp.abs(re.constraint_multipliers).max()) == 0.0
        # trajectory is the fresh straight line between the new endpoints
        full = np.asarray(solver.full_trajectory(re))
        np.testing.assert_allclose(full[0], new_start, atol=1e-6)
        np.testing.assert_allclose(full[-1], new_goal, atol=1e-6)
        # and the retargeted state runs
        re, _ = jax.jit(lambda s, o: solver.run(s, o, 20))(re, oracle)
        assert np.isfinite(np.asarray(re.trajectory)).all()


class TestFleetService:
    def make_service(self, n_robots=4, shared_field=True):
        env, oracle, solver = car_oracle_solver()
        svc = FleetReplanningService(
            solver, n_robots, env.bounds, oracle,
            planning_timeout=0.05, shared_field=shared_field,
        )
        return env, svc

    def test_cycle_empty_until_goal(self):
        env, svc = self.make_service()
        assert svc.replan_cycle() == {}
        assert not svc.set_goal(0, env.goal)  # no pose yet
        svc.update_robot_pose(0, env.start)
        assert svc.set_goal(0, env.goal)

    def test_two_robots_shared_field(self):
        env, svc = self.make_service()
        svc.update_robot_pose(0, env.start)
        svc.update_robot_pose(1, env.goal)
        assert svc.set_goal(0, env.goal)
        assert svc.set_goal(1, env.start)
        paths = svc.replan_cycle()
        assert set(paths) == {0, 1}
        for robot, (s, g) in {0: (env.start, env.goal), 1: (env.goal, env.start)}.items():
            p = paths[robot]
            assert np.isfinite(p).all()
            np.testing.assert_allclose(p[0], np.asarray(s, np.float32), atol=1e-4)
            np.testing.assert_allclose(p[-1], np.asarray(g, np.float32), atol=1e-4)
        # shared field: replicas identical across all lanes after cycles
        for leaf in jax.tree_util.tree_leaves(svc._states.field_params):
            arr = np.asarray(leaf)
            np.testing.assert_allclose(arr[0], arr[-1], atol=1e-5)

    def test_retarget_midway_and_stop(self):
        env, svc = self.make_service(n_robots=2)
        svc.update_robot_pose(0, env.start)
        svc.set_goal(0, env.goal)
        svc.replan_cycle()
        # robot 0 moves, gets a new goal; field survives the retarget
        field_before = jax.tree_util.tree_leaves(svc._states.field_params)[0]
        svc.update_robot_pose(0, [1.5, 1.5, 0.0])
        svc.set_goal(0, [0.5, 2.5, 0.0])
        field_after = jax.tree_util.tree_leaves(svc._states.field_params)[0]
        np.testing.assert_array_equal(np.asarray(field_before), np.asarray(field_after))
        paths = svc.replan_cycle()
        np.testing.assert_allclose(
            paths[0][-1], np.asarray([0.5, 2.5, 0.0], np.float32), atol=1e-4
        )
        svc.stop(0)
        assert svc.replan_cycle() == {}

    def test_independent_fields_mode(self):
        env, svc = self.make_service(n_robots=2, shared_field=False)
        svc.update_robot_pose(0, env.start)
        svc.set_goal(0, env.goal)
        paths = svc.replan_cycle()
        assert 0 in paths and np.isfinite(paths[0]).all()

    def test_chunk_must_fit_reparam_freq(self):
        env, oracle, solver = car_oracle_solver()
        with pytest.raises(ValueError, match="multiple"):
            FleetReplanningService(
                solver, 2, env.bounds, oracle, steps_per_chunk=7,
                shared_field=True,
            )


class TestFleetGroupSize:
    def test_sub_fleet_field_groups(self):
        """group_size < n_robots: one field per sub-fleet (the REPLAN_r05
        256-robot serving configuration at dryrun scale) — replicas in
        lockstep WITHIN each group, independent ACROSS groups."""
        env, oracle, solver = car_oracle_solver()
        svc = FleetReplanningService(
            solver, 4, env.bounds, oracle,
            planning_timeout=0.05, group_size=2,
        )
        for r, (s, g) in enumerate(
            [(env.start, env.goal), (env.goal, env.start)] * 2
        ):
            svc.update_robot_pose(r, s)
            assert svc.set_goal(r, g)
        paths = svc.replan_cycle()
        assert set(paths) == {0, 1, 2, 3}
        for p in paths.values():
            assert np.isfinite(p).all()
        for leaf in jax.tree_util.tree_leaves(svc._states.field_params):
            arr = np.asarray(leaf)
            np.testing.assert_array_equal(arr[0], arr[1])
            np.testing.assert_array_equal(arr[2], arr[3])
            assert not np.array_equal(arr[0], arr[2])  # groups independent

    def test_group_size_must_divide(self):
        env, oracle, solver = car_oracle_solver()
        with pytest.raises(ValueError, match="divisible"):
            FleetReplanningService(
                solver, 4, env.bounds, oracle, group_size=3
            )


class TestMultiMapFleet:
    def test_groups_on_different_maps(self):
        """Multi-tenant serving: 2 field groups on DIFFERENT maps, one chip.
        Each group's robots must avoid THEIR map's obstacles (checked against
        each group's own oracle), and the shared fields stay per-group."""
        from nfopp_tpu.worlds import CircleOracle, circle_collision

        env, oracle, solver = car_oracle_solver()
        svc = FleetReplanningService(
            solver, 4, env.bounds, oracle,
            planning_timeout=0.05, group_size=2,
        )
        # group 1 gets a DIFFERENT world: obstacles shifted
        shifted = CircleOracle(
            oracle.points + jnp.asarray([0.4, 0.4], jnp.float32),
            oracle.mask, oracle.radius, oracle.bounds,
        )
        svc.update_world(shifted, group=1)
        arr = np.asarray(svc._oracles.points)
        np.testing.assert_array_equal(arr[0], arr[1])
        np.testing.assert_array_equal(arr[2], arr[3])
        assert not np.array_equal(arr[0], arr[2])
        for r, (s, g) in enumerate(
            [(env.start, env.goal), (env.goal, env.start)] * 2
        ):
            svc.update_robot_pose(r, s)
            assert svc.set_goal(r, g)
        paths = svc.replan_cycle()
        assert set(paths) == {0, 1, 2, 3}
        for p in paths.values():
            assert np.isfinite(p).all()
        # per-group fields in lockstep, independent across maps
        for leaf in jax.tree_util.tree_leaves(svc._states.field_params):
            a = np.asarray(leaf)
            np.testing.assert_array_equal(a[0], a[1])
            np.testing.assert_array_equal(a[2], a[3])

    def test_group_update_requires_world(self):
        env, oracle, solver = car_oracle_solver()
        svc = FleetReplanningService(
            solver, 4, env.bounds, oracle, group_size=2,
        )
        with pytest.raises(ValueError, match="out of range"):
            svc.update_world(oracle, group=5)
