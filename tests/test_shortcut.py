"""Path shortcutting: feasibility preserved, length monotone, endpoints fixed.

The reference has no simplification pass (get_path returns the raw iterate;
OMPL's PathSimplifier is never invoked through BenchmarkAdapter.cpp) — this
is an added capability, so the tests pin OUR contract, not reference parity.
"""
import jax
import jax.numpy as jnp
import numpy as np

from nfopp_tpu.ops.shortcut import shortcut_batch, shortcut_path
from nfopp_tpu.solver.tracking import evaluate_path
from nfopp_tpu.worlds import CircleOracle, circle_collision, pad_obstacle_points

BOUNDS = jnp.asarray([0.0, 10.0, 0.0, 10.0], jnp.float32)


def _oracle(obstacles):
    pts, mask = pad_obstacle_points(np.asarray(obstacles, np.float32), 8)
    return CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.5), BOUNDS
    )


def _detour_path(m=30):
    """A path that bows far around a single central obstacle."""
    t = np.linspace(0.0, 1.0, m, dtype=np.float32)
    x = 1.0 + 8.0 * t
    y = 1.0 + 6.0 * np.sin(np.pi * t)  # big arc; chord shortcuts exist
    return jnp.asarray(np.stack([x, y], axis=1))


def test_shortcut_shortens_and_stays_feasible():
    oracle = _oracle([[5.0, 0.0]])  # obstacle below the arc
    path = _detour_path()
    collides0, len0 = evaluate_path(circle_collision, oracle, path, 5)
    assert not bool(collides0)
    out = shortcut_path(circle_collision, oracle, path, jax.random.PRNGKey(0), 64)
    collides1, len1 = evaluate_path(circle_collision, oracle, out, 5)
    assert not bool(collides1)
    assert float(len1) < float(len0) * 0.9  # the arc is far from taut
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(path[0]))
    np.testing.assert_allclose(np.asarray(out[-1]), np.asarray(path[-1]))


def test_shortcut_respects_obstacle():
    # obstacle sits ON the straight chord between the endpoints: full
    # shortcut must be rejected, the result must still dodge it
    oracle = _oracle([[5.0, 1.0]])
    path = _detour_path()
    out = shortcut_path(circle_collision, oracle, path, jax.random.PRNGKey(1), 128)
    collides, length = evaluate_path(circle_collision, oracle, out, 5)
    assert not bool(collides)
    # straight-line length is 8; anything at 8.0 would pass through the disc
    assert float(length) > 8.05


def test_infeasible_path_is_noop():
    # the whole path runs along the colliding line, so every chord between
    # path points also collides: nothing can be accepted
    oracle = _oracle([[5.0, 1.0]])
    t = np.linspace(0.0, 1.0, 20, dtype=np.float32)
    bad = jnp.asarray(np.stack([1 + 8 * t, np.full_like(t, 1.0)], axis=1))
    out = shortcut_path(circle_collision, oracle, bad, jax.random.PRNGKey(2), 32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(bad))


def test_infeasible_path_can_be_repaired():
    # a clear path with a mid-span dip into the obstacle: a chord spanning
    # the dip is collision-free, so shortcutting REPAIRS the path to feasible
    # (the documented caveat in shortcut_path; bench/runner.py counts these)
    oracle = _oracle([[5.0, 1.0]])
    m = 20
    t = np.linspace(0.0, 1.0, m, dtype=np.float32)
    y = np.full(m, 3.0, np.float32)
    y[8:12] = 1.0  # dip through the disc at (5, 1)
    bad = jnp.asarray(np.stack([1 + 8 * t, y], axis=1))
    collides0, _ = evaluate_path(circle_collision, oracle, bad, 5)
    assert bool(collides0)
    out = shortcut_path(circle_collision, oracle, bad, jax.random.PRNGKey(4), 128)
    collides1, _ = evaluate_path(circle_collision, oracle, out, 5)
    assert not bool(collides1)


def test_se2_angles_lerped_shortest_arc():
    oracle = _oracle([[50.0, 50.0]])  # far away — everything is free space
    m = 12
    t = np.linspace(0, 1, m, dtype=np.float32)
    theta = np.linspace(3.0, -3.0, m, dtype=np.float32)  # crosses ±pi
    path = jnp.asarray(np.stack([1 + 8 * t, 1 + 0 * t, theta], axis=1))
    out = shortcut_path(circle_collision, oracle, path, jax.random.PRNGKey(3), 64)
    # free space: xy collapses toward the straight line; angles must stay in
    # range (shortest-arc interpolation between 3.0 and -3.0 passes through
    # pi, NOT through 0)
    ang = np.asarray(out[:, 2])
    assert np.all((np.abs(ang) >= 2.9) | np.isclose(np.abs(ang), 3.0, atol=0.2))


def test_batch_matches_single():
    oracle = _oracle([[5.0, 0.0]])
    path = _detour_path()
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x]), oracle
    )
    paths = jnp.stack([path, path])
    out = shortcut_batch(circle_collision, oracles, paths, jax.random.PRNGKey(7), 32)
    k0, k1 = jax.random.split(jax.random.PRNGKey(7), 2)
    single0 = shortcut_path(circle_collision, oracle, path, k0, 32)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single0), rtol=1e-6)


def test_length_never_increases_under_jit():
    oracle = _oracle([[5.0, 0.0]])
    path = _detour_path()
    fn = jax.jit(
        lambda p, k: shortcut_path(circle_collision, oracle, p, k, 16)
    )
    prev = float(evaluate_path(circle_collision, oracle, path, 5)[1])
    p = path
    for s in range(4):
        p = fn(p, jax.random.PRNGKey(s))
        cur = float(evaluate_path(circle_collision, oracle, p, 5)[1])
        assert cur <= prev + 1e-4
        prev = cur
