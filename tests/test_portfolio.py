"""Portfolio solving: batched random restarts make chaotic scenes reliable.

The two-walls S-curve scene is NOT reliably solved by a single run — by this
framework or by the reference itself (BASELINE_MEASURED.md: the reference
fails its own demo scene at seed 100/400). With 8 TPU-batched restarts the
portfolio picks a feasible solution.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.parallel import BatchPlanner, problem_mesh
from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
from nfopp_tpu.solver.tracking import evaluate_path
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def test_portfolio_solves_chaotic_scene():
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), circle_collision)
    planner = BatchPlanner(solver, problem_mesh())
    result = planner.solve_portfolio(
        jax.random.PRNGKey(0), env.start, env.goal, jnp.asarray(env.bounds),
        oracle, restarts=8, max_iterations=800,
    )
    assert bool(result.feasible), "no restart found a feasible path"
    collides, length = evaluate_path(circle_collision, oracle, result.path)
    assert not bool(collides)
    assert float(length) < 8.0  # sane S-curve length in a 3x3 world
    path = np.asarray(result.path)
    np.testing.assert_allclose(path[0], env.start, atol=1e-5)
    np.testing.assert_allclose(path[-1], env.goal, atol=1e-5)
