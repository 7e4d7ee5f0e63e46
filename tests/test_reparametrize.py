"""Golden tests for arc-length reparametrization vs an independent numpy model.

The numpy model below re-derives the reference semantics
(nerf_opt_planner.py:220-248, constrained_nerf_opt_planner.py:132-171) from the
documented behavior: build the normalized arc-length CDF over xy, resample at
uniform parameters with clamped searchsorted indices, lerp xy / wrap-lerp theta,
and re-interpolate both multiplier vectors on the same index/lerp data.
"""
import numpy as np
import jax.numpy as jnp

from nfopp_tpu.ops import reparametrize as rp


def wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def numpy_interp_data(full, distance_dims):
    m = len(full)
    d = np.linalg.norm(np.diff(full[:, :distance_dims], axis=0), axis=1)
    cdf = np.concatenate([[0.0], np.cumsum(d / d.sum())])
    uniform = np.linspace(0, 1, m)[1:-1]
    indices = np.searchsorted(cdf, uniform, side="left")
    ia = np.minimum(indices, m - 1)
    ib = np.maximum(indices - 1, 0)
    denom = np.maximum(cdf[ia] - cdf[ib], 1e-5)
    t = (uniform - cdf[ib]) / denom
    return ia, ib, t


def make_path(seed, n=20, dims=3):
    rng = np.random.RandomState(seed)
    steps = rng.uniform(0.05, 0.8, (n - 1, dims))
    path = np.concatenate([np.zeros((1, dims)), np.cumsum(steps, axis=0)]).astype(np.float32)
    if dims == 3:
        path[:, 2] = rng.uniform(-np.pi, np.pi, n)
    return path


def test_reparametrize_xy_golden():
    full = make_path(0, dims=2)
    ia, ib, t = numpy_interp_data(full, 2)
    expected = (1 - t[:, None]) * full[ib] + t[:, None] * full[ia]
    got = np.asarray(rp.reparametrize_xy(jnp.asarray(full)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_reparametrize_xy_uniform_spacing():
    """After resampling, interior segment lengths should be near-uniform."""
    full = make_path(1, dims=2)
    new_interior = np.asarray(rp.reparametrize_xy(jnp.asarray(full)))
    new_full = np.concatenate([full[:1], new_interior, full[-1:]])
    seg = np.linalg.norm(np.diff(new_full, axis=0), axis=1)
    assert seg.std() / seg.mean() < 0.35  # piecewise-linear resample tolerance


def test_reparametrize_se2_golden():
    full = make_path(2, dims=3)
    ia, ib, t = numpy_interp_data(full, 2)
    exp_xy = (1 - t[:, None]) * full[ib, :2] + t[:, None] * full[ia, :2]
    exp_theta = full[ib, 2] + t * wrap(full[ia, 2] - full[ib, 2])
    got, _ = rp.reparametrize_se2(jnp.asarray(full))
    got = np.asarray(got)
    np.testing.assert_allclose(got[:, :2], exp_xy, atol=1e-5)
    np.testing.assert_allclose(got[:, 2], exp_theta, atol=1e-5)


def test_reparametrize_multipliers_golden():
    full = make_path(3, dims=3)
    n = len(full) - 2
    rng = np.random.RandomState(4)
    coll = rng.rand(n).astype(np.float32)
    cons = rng.randn(n + 1).astype(np.float32)

    ia, ib, t = numpy_interp_data(full, 2)
    padded = np.concatenate([[0.0], coll, [0.0]])
    exp_coll = (1 - t) * padded[ib] + t * padded[ia]

    nodes = np.concatenate([[cons[0]], (cons[:-1] + cons[1:]) / 2, [cons[-1]]])
    vals = (1 - t) * nodes[ib] + t * nodes[ia]
    exp_cons = np.concatenate([[vals[0]], (vals[:-1] + vals[1:]) / 2, [vals[-1]]])

    _, interp = rp.reparametrize_se2(jnp.asarray(full))
    got_coll = np.asarray(rp.reparametrize_collision_multipliers(jnp.asarray(coll), interp))
    got_cons = np.asarray(rp.reparametrize_constraint_multipliers(jnp.asarray(cons), interp))
    np.testing.assert_allclose(got_coll, exp_coll, atol=1e-5)
    np.testing.assert_allclose(got_cons, exp_cons, atol=1e-5)


def test_reparametrize_degenerate_zero_length_segments():
    """Clamped denominator path: duplicated waypoints must not produce NaNs."""
    full = make_path(5, dims=3)
    full[5] = full[4]
    full[6] = full[4]
    got, _ = rp.reparametrize_se2(jnp.asarray(full))
    assert np.isfinite(np.asarray(got)).all()


def test_collapsed_path_reparametrizes_finite():
    """update_start with the pose EXACTLY on the final waypoint collapses the
    trajectory to a point; the arc-length CDF must stay finite (guarded
    total length) instead of 0/0-NaN'ing the state — a robot whose tracked
    pose lands on the path end hits this in production (fleet dynamic
    sessions froze a whole shared-field group with NaNs before the fix)."""
    import jax

    from nfopp_tpu.models import ONFConfig
    from nfopp_tpu.ops.reparametrize import reparametrize_se2
    from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
    from nfopp_tpu.worlds import CircleOracle, circle_collision

    point = jnp.tile(jnp.asarray([1.5, 1.0, 0.3], jnp.float32)[None], (14, 1))
    out, interp = reparametrize_se2(point)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(point[1:-1]),
                               atol=1e-4)

    cfg = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
    )
    solver = ConstrainedSolver(cfg, circle_collision)
    bounds = jnp.asarray([0.0, 4.0, 0.0, 2.0], jnp.float32)
    oracle = CircleOracle(
        jnp.asarray([[2.0, 0.5], [2.1, 0.5]], jnp.float32),
        jnp.asarray(np.ones(2, bool)), jnp.float32(0.2), bounds,
    )
    goal = jnp.asarray([3.7, 0.6, 0.0], jnp.float32)
    st = solver.init_state(
        jax.random.PRNGKey(0), jnp.asarray([0.3, 0.6, 0.0], jnp.float32),
        goal, bounds, oracle,
    )
    st, _ = jax.jit(lambda s, o: solver.run(s, o, 50))(st, oracle)
    st = solver.update_start(st, goal)  # pose lands exactly on the goal
    assert np.isfinite(np.asarray(st.trajectory)).all()
    st, _ = jax.jit(lambda s, o: solver.run(s, o, 20))(st, oracle)
    assert np.isfinite(np.asarray(st.trajectory)).all()
    # a later retarget to a REAL goal recovers a working solve
    st = solver.retarget(st, goal, jnp.asarray([0.5, 1.5, 0.0], jnp.float32))
    st, _ = jax.jit(lambda s, o: solver.run(s, o, 50))(st, oracle)
    assert np.isfinite(np.asarray(st.trajectory)).all()
