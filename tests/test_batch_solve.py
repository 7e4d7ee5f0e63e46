"""BatchPlanner.solve end-to-end (benchmark loop over a sharded batch)."""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.parallel import BatchPlanner, problem_mesh
from nfopp_tpu.solver import ConstrainedSolver, run_planner_config
from nfopp_tpu.worlds import (
    RectangleOracle,
    car_environment,
    pad_obstacle_points,
    rectangle_collision,
)


def test_batch_solve_with_tracking():
    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    solver = ConstrainedSolver(run_planner_config(), rectangle_collision)
    planner = BatchPlanner(solver, problem_mesh())
    batch = 8
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    states = planner.init_batch(jax.random.PRNGKey(1), starts, goals, bounds, oracles)
    result = planner.solve(
        states, oracles, max_iterations=600, min_iterations=200, check_freq=50
    )
    feasible = np.asarray(result.feasible)
    assert feasible.sum() >= 6  # car scene solves reliably
    assert result.path.shape == (batch, 102, 3)
    # early stop engaged for at least some problems
    iters = np.asarray(result.iterations)
    assert (iters <= 600).all() and (iters >= 250).all()
    # result stays sharded over the mesh
    assert len({s.device for s in result.path.addressable_shards}) == 8


def test_aot_prefix_solve_matches_plain(tmp_path, monkeypatch):
    """BatchPlanner(aot_prefix=...) routes solve/init through aot_or_compile
    (lower+compile with statics stripped); results must equal the plain jit
    path exactly. On the CPU test backend the store itself is gated off, so
    this pins the compile-and-call convention; with allow_cpu monkeypatched
    the load path is additionally exercised end-to-end in-process."""
    import nfopp_tpu.utils.aot as aot_mod

    monkeypatch.setattr(aot_mod, "_aot_root", lambda: tmp_path)
    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = RectangleOracle(
        jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    cfg = run_planner_config()._replace(
        trajectory_length=10, collision_point_count=8
    )
    solver = ConstrainedSolver(cfg, rectangle_collision)
    batch = 4
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    mesh = problem_mesh(jax.devices()[:1])

    plain = BatchPlanner(solver, mesh)
    routed = BatchPlanner(solver, mesh, aot_prefix="test")
    kw = dict(max_iterations=20, min_iterations=5, check_freq=5)
    sp = plain.init_batch(jax.random.PRNGKey(0), starts, goals, bounds, oracles)
    rp = routed.init_batch(jax.random.PRNGKey(0), starts, goals, bounds, oracles)
    for a, b in zip(jax.tree_util.tree_leaves(sp), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    res_p = plain.solve(sp, oracles, **kw)
    res_r = routed.solve(rp, oracles, **kw)
    np.testing.assert_array_equal(
        np.asarray(res_p.feasible), np.asarray(res_r.feasible)
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.iterations), np.asarray(res_r.iterations)
    )
    np.testing.assert_array_equal(
        np.asarray(res_p.path), np.asarray(res_r.path)
    )
    # the routed planner recorded its program resolutions
    names = [e["program"] for e in routed.aot_events]
    assert names == ["init", "track"]
