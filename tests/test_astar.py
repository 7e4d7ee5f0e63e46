"""Tests for grid search (host A*/JPS) and the batched device wavefront."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.astar import (
    AstarTrajectoryInitializer,
    GridSearch,
    astar,
    batched_wavefront_trajectories,
    distance_field,
    extract_path,
    jump_point_search,
)


def wall_grid():
    """10x10 grid with a vertical wall at col 5, gap at row 8."""
    g = np.zeros((10, 10), bool)
    g[:, 5] = True
    g[8, 5] = False
    return g


def path_cost(cells):
    d = np.abs(np.diff(cells, axis=0))
    return np.sum(np.where(d.sum(1) == 2, np.sqrt(2), 1.0))


class TestHostSearch:
    def test_straight_line(self):
        cells = astar(np.zeros((5, 5), bool), (0, 0), (4, 4))
        assert tuple(cells[0]) == (0, 0) and tuple(cells[-1]) == (4, 4)
        np.testing.assert_allclose(path_cost(cells), 4 * np.sqrt(2), atol=1e-6)

    def test_goes_through_gap(self):
        cells = astar(wall_grid(), (0, 0), (0, 9))
        assert tuple(cells[-1]) == (0, 9)
        crossings = cells[cells[:, 1] == 5]
        assert (crossings[:, 0] == 8).all()  # only the gap row crosses the wall
        blocked = wall_grid()
        assert not blocked[cells[:, 0], cells[:, 1]].any()

    def test_no_path_raises(self):
        g = np.zeros((5, 5), bool)
        g[:, 2] = True
        with pytest.raises(ValueError):
            astar(g, (0, 0), (0, 4))

    def test_blocked_endpoint_raises(self):
        g = np.zeros((3, 3), bool)
        g[1, 1] = True
        with pytest.raises(ValueError):
            astar(g, (1, 1), (2, 2))

    def test_jps_matches_astar_cost(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            g = rng.rand(20, 20) < 0.25
            g[0, 0] = g[19, 19] = False
            try:
                a = astar(g, (0, 0), (19, 19))
            except ValueError:
                continue
            j = jump_point_search(g, (0, 0), (19, 19))
            assert not g[j[:, 0], j[:, 1]].any()  # jps path avoids obstacles
            np.testing.assert_allclose(path_cost(j), path_cost(a), atol=1e-6)

    def test_jps_expands_fewer_nodes(self):
        g = np.zeros((40, 40), bool)
        s_astar = GridSearch(g, jps=False)
        s_astar.find_path((0, 0), (39, 39))
        s_jps = GridSearch(g, jps=True)
        s_jps.find_path((0, 0), (39, 39))
        assert s_jps.expanded < s_astar.expanded


class TestWavefront:
    def test_distance_field_matches_geodesics(self):
        g = jnp.asarray(np.zeros((8, 8), bool))
        dist = np.asarray(distance_field(g, jnp.asarray([0, 0])))
        np.testing.assert_allclose(dist[0, 5], 5.0, atol=1e-5)
        np.testing.assert_allclose(dist[3, 3], 3 * np.sqrt(2), atol=1e-4)

    def test_distance_field_respects_walls(self):
        g = jnp.asarray(wall_grid())
        dist = np.asarray(distance_field(g, jnp.asarray([0, 9])))
        assert dist[0, 0] > 9  # must detour via the gap at row 8
        assert not np.isfinite(dist[0, 5]) or dist[0, 5] > 1e30  # wall cell unreachable

    def test_extract_path_reaches_goal(self):
        g = jnp.asarray(wall_grid())
        dist = distance_field(g, jnp.asarray([0, 9]))
        cells, valid = extract_path(dist, jnp.asarray([0, 0]))
        cells = np.asarray(cells)
        valid = np.asarray(valid)
        last = cells[np.where(valid)[0][-1]]
        np.testing.assert_array_equal(last, [0, 9])

    def test_batched_trajectories(self):
        batch = 3
        g = np.tile(wall_grid()[None], (batch, 1, 1))
        starts = np.tile(np.array([0.5, 0.5, 0.0], np.float32)[None], (batch, 1))
        goals = np.tile(np.array([9.5, 0.5, 1.0], np.float32)[None], (batch, 1))
        origin = np.zeros((batch, 2), np.float32)
        res = np.ones(batch, np.float32)
        trajs = jax.jit(
            lambda *a: batched_wavefront_trajectories(*a, length=30)
        )(jnp.asarray(g), jnp.asarray(starts), jnp.asarray(goals), jnp.asarray(origin), jnp.asarray(res))
        trajs = np.asarray(trajs)
        assert trajs.shape == (batch, 30, 3)
        # interior waypoints detour toward the gap row (y around 8.5)
        assert trajs[0, :, 1].max() > 7.0
        assert np.isfinite(trajs).all()


class TestInitializer:
    def test_initial_trajectory_avoids_wall(self):
        blocked_world = wall_grid()  # treat cells as 1x1 world units

        def collision_fn(poses):
            i = np.clip(poses[:, 1].astype(int), 0, 9)
            j = np.clip(poses[:, 0].astype(int), 0, 9)
            return blocked_world[i, j]

        init = AstarTrajectoryInitializer(collision_fn, (0.0, 10.0, 0.0, 10.0), resolution=1.0)
        start = np.array([0.5, 0.5, 0.0], np.float32)
        goal = np.array([9.5, 0.5, 0.5], np.float32)
        traj = init.initial_trajectory(start, goal, 50)
        assert traj.shape == (50, 3)
        assert traj[:, 1].max() > 6.5  # detours via the gap
        # angles interpolate start->goal
        assert abs(traj[0, 2] - 0.0) < 0.1 and abs(traj[-1, 2] - 0.5) < 0.1
