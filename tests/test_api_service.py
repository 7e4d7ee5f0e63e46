"""Tests for the stateful planner API, factory, postprocessor, and service."""
import numpy as np
import jax.numpy as jnp
import pytest

from nfopp_tpu.service import PathPostprocessor, ReplanningService
from nfopp_tpu.solver import DEFAULT_PARAMETERS, PlannerFactory, config_from_parameters
from nfopp_tpu.utils import AttributeDict, Config
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def make_oracle(env):
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    return CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )


RUN_PLANNER_PARAMS = AttributeDict(
    trajectory_length=100,
    collision_model=AttributeDict(
        mean=0, sigma=1, use_cos=True, bias=True, use_normal_init=True,
        angle_encoding=True, name="ONF",
    ),
    collision_optimizer=AttributeDict(lr=5e-2, betas=(0.9, 0.9)),
    trajectory_optimizer=AttributeDict(lr=1e-2, betas=(0.9, 0.9)),
    planner=AttributeDict(
        name="ConstrainedNFOPPlanner", trajectory_random_offset=0.02,
        collision_weight=1, velocity_hessian_weight=0.5, random_field_points=10,
        init_collision_iteration=0, constraint_deltas_weight=20, multipliers_lr=0.1,
        init_collision_points=100, reparametrize_trajectory_freq=10,
        optimize_collision_model_freq=1, angle_weight=0.5, angle_offset=0.3,
        boundary_weight=1, collision_multipliers_lr=1e-3,
    ),
)


class TestConfigFromParameters:
    def test_maps_reference_schema(self):
        cfg = config_from_parameters(RUN_PLANNER_PARAMS)
        assert cfg.trajectory_length == 100
        assert cfg.collision_lr == 5e-2
        assert cfg.onf.angle_encoding is True
        assert cfg.onf.sigma == 1.0
        assert cfg.constraint_deltas_weight == 20.0
        assert cfg.angle_offset == 0.3

    def test_json_override_merge(self):
        """The run_bench_mr 'nfomp' section override flow."""
        cfg = Config.from_dict(RUN_PLANNER_PARAMS)
        cfg.update({"trajectory_length": 50, "planner": {"collision_weight": 7}})
        out = config_from_parameters(cfg.as_attribute_dict())
        assert out.trajectory_length == 50
        assert out.collision_weight == 7.0
        assert out.multipliers_lr == 0.1  # sibling keys survive

    def test_defaults(self):
        cfg = config_from_parameters(DEFAULT_PARAMETERS)
        assert cfg.onf.sigma == 10.0
        assert cfg.constraint_deltas_weight == 0.2


class TestNFOPPlanner:
    def test_continuous_planner_interface(self):
        env = two_walls_se2_environment()
        oracle = make_oracle(env)
        planner = PlannerFactory.make_constrained_onf_planner(
            circle_collision, oracle, RUN_PLANNER_PARAMS
        )
        planner.init(env.start, env.goal, env.bounds)
        path = planner.get_path()
        assert path.shape == (102, 3)
        np.testing.assert_allclose(path[0], env.start, atol=1e-6)

        planner.step(20)
        path = planner.get_path()
        np.testing.assert_allclose(path[-1], env.goal, atol=1e-6)

        planner.update_goal_point(np.array([2.0, 2.0, 0.3], np.float32))
        np.testing.assert_allclose(planner.get_path()[-1], [2.0, 2.0, 0.3], atol=1e-5)
        planner.update_start_point(np.array([0.6, 0.6, 0.0], np.float32))
        np.testing.assert_allclose(planner.get_path()[0], [0.6, 0.6, 0.0], atol=1e-5)
        planner.set_boundaries((0.0, 4.0, 0.0, 4.0))
        planner.step(5)

    def test_holonomic_factory(self):
        from nfopp_tpu.worlds import two_walls_environment

        env = two_walls_environment()
        oracle = make_oracle(env)
        planner = PlannerFactory.make_onf_planner(circle_collision, oracle)
        planner.init(env.start, env.goal, env.bounds)
        planner.step(10)
        assert planner.get_path().shape == (102, 2)


class TestPathPostprocessor:
    def test_resamples_to_distance_step(self):
        theta = np.zeros(50)
        traj = np.stack([np.linspace(0, 1, 50), np.zeros(50), theta], axis=1)
        out = PathPostprocessor(distance_step=0.05).process(traj)
        seg = np.linalg.norm(np.diff(out[:, :2], axis=0), axis=1)
        np.testing.assert_allclose(seg, 0.05, atol=0.02)

    def test_drops_duplicates(self):
        traj = np.array([[0, 0, 0]] * 5 + [[1, 0, 0]] * 5 + [[2, 0, 0]], np.float64)
        out = PathPostprocessor(distance_step=0.5).process(traj)
        assert np.isfinite(out).all()

    def test_trims_initial_direction_flip(self):
        # first two segments move backwards (heading 0, x decreasing), rest forward
        x = np.concatenate([[0.2, 0.1], np.linspace(0.0, 2.0, 30)])
        traj = np.stack([x, np.zeros_like(x), np.zeros_like(x)], axis=1)
        out = PathPostprocessor(distance_step=0.05).process(traj)
        # the backward prefix (x > 0 decreasing) is trimmed
        forward = np.diff(out[:, 0])
        assert (forward[5:] > 0).all()

    def test_short_path_passthrough(self):
        traj = np.array([[0, 0, 0], [1, 1, 1]], np.float64)
        out = PathPostprocessor().process(traj)
        np.testing.assert_array_equal(out, traj)


class TestReplanningService:
    def test_full_replanning_flow(self):
        env = two_walls_se2_environment()
        oracle = make_oracle(env)
        planner = PlannerFactory.make_constrained_onf_planner(
            circle_collision, oracle, RUN_PLANNER_PARAMS
        )
        published = []
        service = ReplanningService(
            planner,
            planning_timeout=0.05,
            steps_per_chunk=5,
            postprocessor=PathPostprocessor(),
            path_callback=published.append,
        )
        # no goal yet -> idle
        assert service.replan_cycle() is None
        # missing pose/bounds -> set_goal refused
        assert not service.set_goal(env.goal)

        service.update_robot_pose(env.start)
        service.update_boundaries(env.bounds)
        assert service.set_goal(env.goal)

        path = service.replan_cycle()
        assert path is not None and len(published) == 1
        assert path.shape[1] == 3

        # robot moved: next cycle starts from the new pose
        new_pose = np.array([0.6, 0.55, 0.05], np.float32)
        service.update_robot_pose(new_pose)
        path2 = service.replan_cycle()
        np.testing.assert_allclose(
            planner.get_path()[0], new_pose, atol=1e-5
        )
        service.stop()
        assert service.replan_cycle() is None
