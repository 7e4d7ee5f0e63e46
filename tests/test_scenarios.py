"""Tests for benchmark scenario worlds + grid oracle conventions."""
import numpy as np
import jax.numpy as jnp

from nfopp_tpu.worlds import (
    GridScenario,
    corridor,
    dilate,
    grid_collision,
    parse_movingai_map,
    parse_movingai_scen,
    polygon_world,
    random_forest,
)


def test_polygon_world_rasterization():
    square = np.array([[2.0, 2.0], [6.0, 2.0], [6.0, 6.0], [2.0, 6.0]])
    triangle = np.array([[7.0, 7.0], [9.0, 7.0], [8.0, 9.0]])
    s = polygon_world([square, triangle], bounds=(0, 10, 0, 10), resolution=0.5)
    assert s.blocked.shape == (20, 20)
    oracle = s.oracle()
    q = jnp.asarray(
        [[4.0, 4.0], [1.0, 1.0], [8.0, 7.4], [8.0, 9.5], [6.4, 4.0]], jnp.float32
    )
    got = np.asarray(grid_collision(oracle, q))
    # inside square, outside, inside triangle, above triangle apex, right of square
    np.testing.assert_array_equal(got, [True, False, True, False, False])


def test_polygon_world_hole_via_evenodd():
    # a square with a square hole: evenodd mode leaves the hole free,
    # union mode blocks it
    outer = np.array([[1.0, 1.0], [9.0, 1.0], [9.0, 9.0], [1.0, 9.0]])
    inner = np.array([[3.0, 3.0], [7.0, 3.0], [7.0, 7.0], [3.0, 7.0]])
    q = jnp.asarray([[5.0, 5.0], [1.5, 1.5], [0.5, 0.5]], jnp.float32)

    s_eo = polygon_world([outer, inner], bounds=(0, 10, 0, 10), resolution=0.25, mode="evenodd")
    got = np.asarray(grid_collision(s_eo.oracle(), q))
    np.testing.assert_array_equal(got, [False, True, False])  # hole is free

    s_union = polygon_world([outer, inner], bounds=(0, 10, 0, 10), resolution=0.25)
    got = np.asarray(grid_collision(s_union.oracle(), q))
    np.testing.assert_array_equal(got, [True, True, False])


def test_grid_oracle_xy_row_col_convention():
    """Asymmetric block: x indexes columns, y indexes rows."""
    blocked = np.zeros((10, 20), bool)  # H=10 (y in [0,10)), W=20 (x in [0,20))
    blocked[2, 15] = True  # world cell x in [15,16), y in [2,3)
    scenario = GridScenario(blocked=blocked, resolution=1.0)
    oracle = scenario.oracle()
    q = jnp.asarray(
        [[15.5, 2.5], [2.5, 15.5], [15.5, 3.5], [14.5, 2.5]], jnp.float32
    )
    got = np.asarray(grid_collision(oracle, q))
    # (2.5, 15.5) is outside bounds in y (H=10) -> boundary collision True
    np.testing.assert_array_equal(got, [True, True, False, False])


def test_random_forest_properties():
    s = random_forest(seed=3, size=(100, 100), obstacle_ratio=0.03)
    ratio = s.blocked.mean()
    assert 0.01 < ratio < 0.06
    assert s.start is not None and s.goal is not None
    # endpoints are on free cells
    for pose in (s.start, s.goal):
        j, i = int(pose[0]), int(pose[1])
        assert not s.blocked[i, j]


def test_corridor_connected_and_carved():
    s = corridor(seed=5, size=100, branches=100, radius=3)
    free_ratio = (~s.blocked).mean()
    assert 0.1 < free_ratio < 0.95
    # start/goal are free and reachable (host A* as ground truth)
    from nfopp_tpu.astar import astar

    start_cell = (int(s.start[1]), int(s.start[0]))
    goal_cell = (int(s.goal[1]), int(s.goal[0]))
    path = astar(s.blocked, start_cell, goal_cell)
    assert len(path) >= 1


def test_dilate_disc():
    g = np.zeros((11, 11), bool)
    g[5, 5] = True
    d = dilate(g, 2)
    assert d[5, 7] and d[7, 5] and d[5, 3] and d[3, 5]
    assert not d[5, 8] and not d[8, 8]
    assert d.sum() > g.sum()


def test_movingai_map_parser():
    text = """type octile
height 4
width 6
map
......
..@@..
..@@..
.....T
"""
    s = parse_movingai_map(text)
    assert s.blocked.shape == (4, 6)
    assert s.blocked[1, 2] and s.blocked[2, 3]
    assert s.blocked[3, 5]  # T = tree = blocked
    assert not s.blocked[0, 0] and not s.blocked[3, 0]
    assert s.bounds == (0.0, 6.0, 0.0, 4.0)


def test_movingai_scen_parser():
    text = """version 1
0\tBerlin_0_256.map\t256\t256\t1\t2\t3\t4\t5.656854
1\tBerlin_0_256.map\t256\t256\t10\t20\t30\t40\t100.5
"""
    entries = parse_movingai_scen(text)
    assert len(entries) == 2
    assert entries[0]["start_x"] == 1 and entries[0]["goal_y"] == 4
    assert abs(entries[1]["optimal_length"] - 100.5) < 1e-9


def test_scenario_oracle_with_footprint_dilation():
    blocked = np.zeros((20, 20), bool)
    blocked[10, 10] = True
    s = GridScenario(blocked=blocked, resolution=0.5)
    oracle_sharp = s.oracle(footprint_radius=0.0)
    oracle_fat = s.oracle(footprint_radius=1.0)  # 2 cells
    q = jnp.asarray([[5.75, 4.75]], jnp.float32)  # one cell left of the obstacle
    assert not bool(grid_collision(oracle_sharp, q)[0])
    assert bool(grid_collision(oracle_fat, q)[0])


def test_distant_endpoints_meets_min_geodesic():
    from nfopp_tpu.worlds import distant_endpoints, with_endpoints
    from nfopp_tpu.astar.wavefront import distance_field

    sc = corridor(seed=0, size=100, branches=100, radius=3)
    rng = np.random.RandomState(7)
    start, goal = distant_endpoints(rng, sc, min_geodesic=120.0)
    blocked = dilate(sc.blocked, 2)
    gi = int((goal[1] - sc.origin[1]) // sc.resolution)
    gj = int((goal[0] - sc.origin[0]) // sc.resolution)
    si = int((start[1] - sc.origin[1]) // sc.resolution)
    sj = int((start[0] - sc.origin[0]) // sc.resolution)
    assert not blocked[si, sj] and not blocked[gi, gj]
    dist = np.asarray(distance_field(jnp.asarray(blocked), jnp.asarray([gi, gj])))
    assert dist[si, sj] * sc.resolution >= 120.0
    sc2 = with_endpoints(sc, start, goal)
    assert np.allclose(sc2.start, start) and sc2.blocked is sc.blocked


def test_warehouse_structure_and_connectivity():
    from nfopp_tpu.astar.wavefront import distance_field
    from nfopp_tpu.worlds import warehouse

    sc = warehouse(seed=0)
    assert sc.blocked.shape == (160, 240)  # 120x80 world at 0.5 res
    free = 1 - sc.blocked.mean()
    assert 0.55 < free < 0.92  # racks present, aisles dominate
    # deterministic per seed
    sc2 = warehouse(seed=0)
    np.testing.assert_array_equal(sc.blocked, sc2.blocked)
    np.testing.assert_allclose(sc.start, sc2.start)
    assert not np.array_equal(sc.blocked, warehouse(seed=1).blocked)
    # start and goal are connected on the footprint-dilated grid (r=1.0 -> 2 cells)
    blocked = dilate(sc.blocked, 2)
    gi = int((sc.goal[1] - sc.origin[1]) // sc.resolution)
    gj = int((sc.goal[0] - sc.origin[0]) // sc.resolution)
    si = int((sc.start[1] - sc.origin[1]) // sc.resolution)
    sj = int((sc.start[0] - sc.origin[0]) // sc.resolution)
    assert not blocked[si, sj] and not blocked[gi, gj]
    dist = np.asarray(distance_field(jnp.asarray(blocked), jnp.asarray([gi, gj])))
    assert np.isfinite(dist[si, sj])
    # rack rows exist: some full-width horizontal stretch of blocked cells
    assert (sc.blocked.sum(axis=1) > 100).any()
