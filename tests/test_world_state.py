"""Tests for the live world-state adapters."""
import numpy as np
import jax.numpy as jnp
import pytest

from nfopp_tpu.service import WorldState
from nfopp_tpu.worlds import GridScenario, circle_collision, grid_collision


@pytest.fixture()
def world():
    blocked = np.zeros((10, 10), bool)
    blocked[5, 5] = True
    ws = WorldState(point_capacity=64)
    ws.update_map(GridScenario(blocked=blocked, resolution=1.0))
    return ws


def test_map_to_points_and_boundaries(world):
    assert world.boundaries == (0.0, 10.0, 0.0, 10.0)
    pts = world.merged_points()
    np.testing.assert_allclose(pts, [[5.5, 5.5]])


def test_circle_oracle_merges_sensor_points(world):
    world.update_sensor_points(np.array([[2.0, 2.0]], np.float32))
    oracle = world.circle_oracle(radius=0.4)
    q = jnp.asarray([[2.2, 2.0, 0.0], [5.5, 5.4, 0.0], [8.0, 8.0, 0.0]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(circle_collision(oracle, q)), [True, True, False]
    )


def test_grid_oracle_rasterizes_sensor_points(world):
    world.update_sensor_points(np.array([[2.3, 7.8]], np.float32))
    oracle = world.grid_oracle()
    q = jnp.asarray([[2.5, 7.5], [2.5, 6.5], [5.5, 5.5]], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(grid_collision(oracle, q)), [True, False, True]
    )


def test_grid_oracle_requires_map():
    with pytest.raises(ValueError, match="no map"):
        WorldState().grid_oracle()


def test_sensor_update_replaces(world):
    world.update_sensor_points(np.array([[1.0, 1.0]], np.float32))
    world.update_sensor_points(np.zeros((0, 2), np.float32))
    assert len(world.merged_points()) == 1  # only the map point remains
