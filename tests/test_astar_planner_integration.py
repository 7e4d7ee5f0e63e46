"""Integration: NFOPPlanner + host A* initializer (the reference's benchmark
wiring — AstarTrajectoryInitializer feeding the constrained planner)."""
import numpy as np
import jax.numpy as jnp

from nfopp_tpu.astar import AstarTrajectoryInitializer
from nfopp_tpu.solver import PlannerFactory
from nfopp_tpu.utils import AttributeDict
from nfopp_tpu.worlds import GridScenario, grid_collision


def test_planner_with_astar_initializer():
    # world: vertical wall with a gap near the top
    blocked = np.zeros((20, 20), bool)
    blocked[:16, 10] = True
    scenario = GridScenario(blocked=blocked, resolution=1.0)
    oracle = scenario.oracle()

    def collision_fn(poses):
        return np.asarray(grid_collision(oracle, jnp.asarray(poses, jnp.float32)))

    initializer = AstarTrajectoryInitializer(
        collision_fn, scenario.bounds, resolution=1.0
    )
    params = AttributeDict(
        trajectory_length=60,
        collision_model=AttributeDict(
            mean=10.0, sigma=5.0, use_cos=True, bias=True, use_normal_init=True,
            angle_encoding=True, name="ONF",
        ),
        collision_optimizer=AttributeDict(lr=2e-2, betas=(0.9, 0.9)),
        trajectory_optimizer=AttributeDict(lr=5e-2, betas=(0.9, 0.9)),
        planner=AttributeDict(
            name="ConstrainedNFOPPlanner", trajectory_random_offset=0.02,
            collision_weight=50.0, velocity_hessian_weight=0.5,
            random_field_points=10, init_collision_iteration=50,
            constraint_deltas_weight=50.0, multipliers_lr=0.1,
            angle_weight=2.0, angle_offset=0.3, boundary_weight=1.0,
            collision_multipliers_lr=1e-3, collision_beta=10.0,
        ),
    )
    planner = PlannerFactory.make_constrained_onf_planner(
        grid_collision, oracle, params,
        initial_trajectory_fn=initializer.initial_trajectory,
    )
    start = np.array([3.5, 3.5, 0.0], np.float32)
    goal = np.array([16.5, 3.5, 0.0], np.float32)
    planner.init(start, goal, scenario.bounds)

    # the A* init already detours through the gap (y up near 17)
    path0 = planner.get_path()
    assert path0.shape == (62, 3)
    assert path0[:, 1].max() > 14.0
    np.testing.assert_allclose(path0[0], start, atol=1e-5)
    np.testing.assert_allclose(path0[-1], goal, atol=1e-5)

    planner.step(100)
    path = planner.get_path()
    assert np.isfinite(path).all()
    # endpoints still pinned after optimization
    np.testing.assert_allclose(path[0], start, atol=1e-5)
    np.testing.assert_allclose(path[-1], goal, atol=1e-5)
