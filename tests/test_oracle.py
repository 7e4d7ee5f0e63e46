"""Golden tests for device-side collision oracles vs straightforward numpy."""
import numpy as np
import jax.numpy as jnp

from nfopp_tpu.worlds import (
    CircleOracle,
    GridOracle,
    RectangleOracle,
    boundary_collision,
    circle_collision,
    grid_collision,
    pad_obstacle_points,
    rectangle_collision,
)


BOUNDS = np.array([0.0, 3.0, 0.0, 3.0], np.float32)


def test_boundary_collision():
    xy = jnp.asarray([[1.0, 1.0], [-0.1, 1.0], [3.1, 1.0], [1.0, -0.5], [1.0, 3.5]], jnp.float32)
    got = np.asarray(boundary_collision(jnp.asarray(BOUNDS), xy))
    np.testing.assert_array_equal(got, [False, True, True, True, True])


def test_circle_oracle_golden():
    obstacles = np.array([[1.0, 1.0], [2.0, 2.0]], np.float32)
    pts, mask = pad_obstacle_points(obstacles, 8)
    oracle = CircleOracle(jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3), jnp.asarray(BOUNDS))
    queries = np.array(
        [[1.2, 1.0, 0.5], [1.4, 1.0, 0.0], [2.0, 2.29, 1.0], [0.5, 0.5, 0.0], [-1.0, 1.0, 0.0]],
        np.float32,
    )
    got = np.asarray(circle_collision(oracle, jnp.asarray(queries)))
    # dist to nearest obstacle: 0.2 (hit), 0.4 (free), 0.29 (hit), far (free), out of bounds
    np.testing.assert_array_equal(got, [True, False, True, False, True])


def test_circle_oracle_padding_inert():
    """Padded slots must never collide."""
    pts, mask = pad_obstacle_points(np.zeros((0, 2), np.float32), 8)
    oracle = CircleOracle(jnp.asarray(pts), jnp.asarray(mask), jnp.float32(10.0), jnp.asarray(BOUNDS))
    queries = jnp.asarray(np.random.RandomState(0).uniform(0.1, 2.9, (50, 2)), jnp.float32)
    assert not np.asarray(circle_collision(oracle, queries)).any()


def test_rectangle_oracle_golden():
    """Box (-0.3, 0.2, -0.3, 0.2) in robot frame (the run_planner.py footprint)."""
    obstacles = np.array([[1.0, 1.0]], np.float32)
    pts, mask = pad_obstacle_points(obstacles, 4)
    box = jnp.asarray([-0.3, 0.2, -0.3, 0.2], jnp.float32)
    oracle = RectangleOracle(jnp.asarray(pts), jnp.asarray(mask), box, jnp.asarray(BOUNDS))

    # Robot at the obstacle -> collision; far -> free.
    q = jnp.asarray([[1.0, 1.0, 0.0], [2.0, 2.0, 0.0]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(rectangle_collision(oracle, q)), [True, False])

    # Asymmetric box: obstacle 0.25 ahead is outside (x_max=0.2); rotating the
    # robot 180deg puts it 0.25 behind, inside the -0.3 rear extent.
    q = jnp.asarray([[0.75, 1.0, 0.0], [0.75, 1.0, np.pi]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(rectangle_collision(oracle, q)), [False, True])


def test_rectangle_matches_numpy_reference_formula():
    rng = np.random.RandomState(1)
    obstacles = rng.uniform(0, 3, (20, 2)).astype(np.float32)
    pts, mask = pad_obstacle_points(obstacles, 32)
    box = np.array([-0.3, 0.2, -0.3, 0.2], np.float32)
    oracle = RectangleOracle(jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(box), jnp.asarray(BOUNDS))
    poses = np.stack(
        [rng.uniform(0, 3, 50), rng.uniform(0, 3, 50), rng.uniform(-np.pi, np.pi, 50)], axis=1
    ).astype(np.float32)

    # independent numpy: obstacle in robot frame via R(-theta) @ (o - p)
    expected = np.zeros(50, bool)
    for i, (px, py, th) in enumerate(poses):
        rel = obstacles - [px, py]
        c, s = np.cos(th), np.sin(th)
        lx = c * rel[:, 0] + s * rel[:, 1]
        ly = -s * rel[:, 0] + c * rel[:, 1]
        inside = (lx > box[0]) & (lx < box[1]) & (ly > box[2]) & (ly < box[3])
        expected[i] = inside.any()
    got = np.asarray(rectangle_collision(oracle, jnp.asarray(poses)))
    np.testing.assert_array_equal(got, expected)


def test_grid_oracle():
    occ = np.zeros((30, 30), bool)
    occ[10:20, 10:20] = True  # block covering world [1,2)x[1,2) at res 0.1
    oracle = GridOracle(
        jnp.asarray(occ), jnp.asarray([0.0, 0.0], jnp.float32), jnp.float32(0.1), jnp.asarray(BOUNDS)
    )
    q = jnp.asarray([[1.5, 1.5], [0.5, 0.5], [1.95, 1.05], [2.05, 1.5]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(grid_collision(oracle, q)), [True, False, True, False])
