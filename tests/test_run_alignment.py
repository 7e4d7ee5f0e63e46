"""run()'s static reparametrization schedule vs misaligned entry counts.

The static chunk schedule assumes step_count % freq == 0 on entry; a stateful
caller mixing run lengths (step(5) then step(20)) would silently drift the
reparametrization off the reference's step_count % freq grid. NFOPPlanner
tracks alignment host-side and forces the dynamic path when misaligned — this
pins the fix: mixed-length stepping must equal pure single-stepping exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.solver.api import NFOPPlanner
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def make_planner():
    config = SolverConfig(
        trajectory_length=16,
        collision_point_count=16,
        onf=ONFConfig(mean=0.0, sigma=1.0, use_cos=True, angle_encoding=True),
        reparametrize_trajectory_freq=10,
    )
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(config, circle_collision)
    planner = NFOPPlanner(solver, oracle, seed=7)
    planner.init(env.start, env.goal, env.bounds)
    return planner, solver, oracle


def test_mixed_run_lengths_match_single_stepping():
    planner, solver, oracle = make_planner()
    # 5 (dynamic), 20 (multiple of freq but entered at count 5 -> must NOT
    # take the static path), 5 (dynamic) = 30 steps total
    planner.step(5)
    planner.step(20)
    planner.step(5)
    mixed = np.asarray(planner.get_path())

    control, _, _ = make_planner()
    single_step = jax.jit(control._solver.step)
    state = control.state
    for _ in range(30):
        state, _ = single_step(state, oracle)
    expected = np.asarray(control._solver.full_trajectory(state))

    np.testing.assert_array_equal(mixed, expected)


def test_aligned_runs_still_use_static_schedule():
    """Aligned multiples of freq must match too (static path, same numerics)."""
    planner, solver, oracle = make_planner()
    planner.step(10)
    planner.step(20)
    aligned = np.asarray(planner.get_path())

    control, _, _ = make_planner()
    single_step = jax.jit(control._solver.step)
    state = control.state
    for _ in range(30):
        state, _ = single_step(state, oracle)
    expected = np.asarray(control._solver.full_trajectory(state))

    np.testing.assert_allclose(aligned, expected, atol=1e-6)
