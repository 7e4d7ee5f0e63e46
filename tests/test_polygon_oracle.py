"""Exact polygon-geometry oracle (worlds.oracle.PolygonOracle).

The reference evaluates polygon worlds against OMPL's exact SE(2) state
validity (BenchmarkAdapter.cpp:175-187) and clearance against the true
environment (:106-135). These tests pin the exact even-odd / segment-distance
semantics against analytic cases and the rasterized GridOracle.
"""
import jax.numpy as jnp
import numpy as np

from nfopp_tpu.worlds import (
    GridScenario,
    PolygonOracle,
    pad_polygons,
    polygon_clearance,
    polygon_collision,
    polygon_world,
    warehouse_polygons,
)

from nfopp_tpu.bench import (
    native_binding,
    path_statistics,
    polygons_to_segments,
    segment_clearance_numpy,
)

BOUNDS = jnp.asarray([0.0, 10.0, 0.0, 10.0], jnp.float32)


def square(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float64)


def make_oracle(polys, radius=0.0, **pad_kw):
    vertices, mask = pad_polygons(polys, **pad_kw)
    return PolygonOracle(
        vertices=jnp.asarray(vertices), mask=jnp.asarray(mask),
        radius=jnp.float32(radius), bounds=BOUNDS,
    )


class TestPointInPolygon:
    def test_square_inside_outside(self):
        oracle = make_oracle([square(2, 2, 5, 5)])
        q = jnp.asarray([
            [3.0, 3.0],   # inside
            [1.0, 1.0],   # outside
            [6.0, 3.0],   # outside, ray crosses nothing
            [0.5, 3.0],   # outside, ray crosses both edges
            [4.9, 4.9],   # inside near corner
        ], jnp.float32)
        got = np.asarray(polygon_collision(oracle, q))
        np.testing.assert_array_equal(got, [True, False, False, False, True])

    def test_concave_polygon(self):
        # L-shape: notch at the top right
        poly = np.array(
            [[0, 0], [6, 0], [6, 3], [3, 3], [3, 6], [0, 6]], np.float64
        ) + 1.0
        oracle = make_oracle([poly])
        q = jnp.asarray([
            [2.0, 5.0],  # inside the vertical arm
            [5.0, 2.0],  # inside the horizontal arm
            [5.0, 5.0],  # in the notch: outside
        ], jnp.float32)
        got = np.asarray(polygon_collision(oracle, q))
        np.testing.assert_array_equal(got, [True, True, False])

    def test_multiple_polygons_and_padding(self):
        # different vertex counts (triangle + square) + empty capacity slots
        tri = np.array([[7, 7], [9, 7], [8, 9]], np.float64)
        oracle = make_oracle([square(1, 1, 2, 2), tri], capacity=4, max_vertices=6)
        q = jnp.asarray([[1.5, 1.5], [8.0, 7.5], [5.0, 5.0]], jnp.float32)
        got = np.asarray(polygon_collision(oracle, q))
        np.testing.assert_array_equal(got, [True, True, False])

    def test_out_of_bounds_collides(self):
        oracle = make_oracle([square(2, 2, 3, 3)])
        q = jnp.asarray([[-1.0, 5.0], [5.0, 11.0]], jnp.float32)
        assert np.asarray(polygon_collision(oracle, q)).all()

    def test_se2_queries_ignore_angle(self):
        oracle = make_oracle([square(2, 2, 5, 5)])
        q = jnp.asarray([[3.0, 3.0, 1.2], [1.0, 1.0, -0.7]], jnp.float32)
        got = np.asarray(polygon_collision(oracle, q))
        np.testing.assert_array_equal(got, [True, False])


class TestClearance:
    def test_square_clearance_exact(self):
        oracle = make_oracle([square(2, 2, 5, 5)])
        q = jnp.asarray([
            [1.0, 3.5],  # 1.0 left of the left edge
            [7.0, 7.0],  # nearest point is the corner (5,5): sqrt(8)
            [3.5, 3.5],  # inside -> 0
        ], jnp.float32)
        got = np.asarray(polygon_clearance(oracle, q))
        np.testing.assert_allclose(got, [1.0, np.sqrt(8.0), 0.0], atol=1e-6)

    def test_footprint_inflation(self):
        oracle_pt = make_oracle([square(2, 2, 5, 5)], radius=0.0)
        oracle_r = make_oracle([square(2, 2, 5, 5)], radius=0.6)
        q = jnp.asarray([[1.5, 3.5]], jnp.float32)  # 0.5 from the edge
        assert not bool(polygon_collision(oracle_pt, q)[0])
        assert bool(polygon_collision(oracle_r, q)[0])


class TestExactVsRasterized:
    def test_agrees_with_grid_away_from_boundaries(self):
        """The rasterized GridOracle must agree with the exact oracle at every
        query further than one cell diagonal from any polygon edge — the
        disagreement band is exactly the rasterization error the exact oracle
        removes."""
        polys = warehouse_polygons(3)
        bounds = (0.0, 120.0, 0.0, 80.0)
        scenario = polygon_world(polys, bounds, resolution=0.5)
        grid_oracle = scenario.oracle()
        vertices, mask = pad_polygons(polys)
        exact = PolygonOracle(
            jnp.asarray(vertices), jnp.asarray(mask), jnp.float32(0.0),
            jnp.asarray(bounds, jnp.float32),
        )
        rng = np.random.RandomState(0)
        q = np.stack([
            rng.uniform(0.5, 119.5, 4000), rng.uniform(0.5, 79.5, 4000)
        ], axis=1).astype(np.float32)
        clear = np.asarray(polygon_clearance(exact, jnp.asarray(q)))
        inside = np.asarray(polygon_collision(exact, jnp.asarray(q)))
        from nfopp_tpu.worlds import grid_collision

        grid_hit = np.asarray(grid_collision(grid_oracle, jnp.asarray(q)))
        far = (clear > 0.5 * np.sqrt(2.0) + 1e-3) | inside
        # interior points deeper than a cell: rasterization must agree there
        deep_inside = inside.copy()
        # (cheap proxy: only compare free-side agreement, where clearance is known)
        free_far = far & ~inside
        assert free_far.sum() > 1000
        np.testing.assert_array_equal(grid_hit[free_far], inside[free_far])
        assert deep_inside.sum() > 0  # the world actually has obstacles

    def test_exact_strictly_refines_grid(self):
        """Queries inside the rasterization band prove the delta the exact
        oracle removes: a truly-colliding point the grid calls free (cell
        center outside the polygon) and a truly-free point the grid blocks
        (cell center inside)."""
        polys = [square(2.4, 2.4, 5.1, 5.1)]
        scenario = polygon_world(polys, (0.0, 10.0, 0.0, 10.0), resolution=1.0)
        grid_oracle = scenario.oracle()
        oracle = make_oracle(polys)
        from nfopp_tpu.worlds import grid_collision

        # (5.05, 3.0): inside the polygon (x < 5.1) but its cell [5,6) has
        # center 5.5 — outside, so the grid misses the collision
        q_hit = jnp.asarray([[5.05, 3.0]], jnp.float32)
        assert not bool(grid_collision(grid_oracle, q_hit)[0])
        assert bool(polygon_collision(oracle, q_hit)[0])
        # (2.1, 2.6): outside the polygon (x < 2.4) but its cell [2,3) has
        # center (2.5, 2.5) — inside, so the grid blocks a truly free point
        q_band = jnp.asarray([[2.1, 2.6]], jnp.float32)
        assert bool(grid_collision(grid_oracle, q_band)[0])
        assert not bool(polygon_collision(oracle, q_band)[0])


class TestSegmentClearanceMetrics:
    def test_numpy_exact_square(self):
        segs = polygons_to_segments([square(2, 2, 5, 5)])
        path = np.array([[1.0, 3.5, 0.0], [7.0, 7.0, 0.0]], np.float64)
        mean, med, lo, hi = segment_clearance_numpy(path, segs)
        np.testing.assert_allclose([lo, hi], [1.0, np.sqrt(8.0)], atol=1e-12)
        np.testing.assert_allclose(mean, (1.0 + np.sqrt(8.0)) / 2, atol=1e-12)

    def test_native_matches_numpy(self):
        if not native_binding.available():
            import pytest

            pytest.skip("no C++ toolchain")
        rng = np.random.RandomState(7)
        segs = polygons_to_segments(
            [square(*np.sort(rng.uniform(0, 10, 2)), *np.sort(rng.uniform(0, 10, 2)))
             for _ in range(5)]
        )
        path = np.concatenate(
            [rng.uniform(0, 10, (40, 2)), rng.uniform(-3, 3, (40, 1))], axis=1
        )
        got = native_binding.path_clearance_segments_native(path, segs)
        want = segment_clearance_numpy(path, segs)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_path_statistics_uses_segments(self):
        segs = polygons_to_segments([square(2, 2, 5, 5)])
        path = np.array(
            [[1.0, 3.5, 0.0], [1.0, 6.5, 0.5], [7.0, 7.0, 1.0]], np.float64
        )
        stats = path_statistics(path, obstacle_segments=segs)
        assert abs(stats.min_clearing_distance - 1.0) < 1e-9
        # point-cloud obstacles alone would give different (coarser) values
        pts = np.array([[2.0, 2.0], [5.0, 5.0]])
        stats_pts = path_statistics(path, obstacles=pts)
        assert stats.min_clearing_distance <= stats_pts.min_clearing_distance


class TestExactSuite:
    def test_run_grid_suite_with_polygon_oracle(self):
        """run_grid_suite solving/evaluating against EXACT polygon geometry
        (solve_oracles/oracle_fn override) on a tiny polygon world."""
        import jax

        from nfopp_tpu.bench.runner import run_grid_suite
        from nfopp_tpu.parallel import problem_mesh
        from test_runner import small_parameters

        polys = [square(6.0, 2.0, 8.0, 11.0), square(6.0, 13.0, 8.0, 16.0)]
        bounds = (0.0, 16.0, 0.0, 16.0)
        scen = polygon_world(
            polys, bounds, resolution=1.0,
            start=np.array([3.0, 12.0, 0.0], np.float32),
            goal=np.array([13.0, 12.0, 0.0], np.float32),
        )
        scenarios = [scen, scen]
        vertices, mask = pad_polygons(polys)
        one = PolygonOracle(
            jnp.asarray(vertices), jnp.asarray(mask), jnp.float32(0.0),
            jnp.asarray(bounds, jnp.float32),
        )
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (2,) + (1,) * x.ndim), one
        )
        segs = polygons_to_segments(polys)
        result = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25,
            mesh=problem_mesh(jax.devices()[:2]),
            solve_oracles=oracles, oracle_fn=polygon_collision,
            obstacle_segments=[segs, segs],
        )
        assert result.feasible.all()
        # returned paths are exactly collision-free vs the TRUE polygons
        for b in range(2):
            dense = np.concatenate([
                np.linspace(result.paths[b][i], result.paths[b][i + 1], 5,
                            endpoint=False)
                for i in range(len(result.paths[b]) - 1)
            ])
            hits = np.asarray(
                polygon_collision(one, jnp.asarray(dense, jnp.float32))
            )
            assert not hits.any()
        stats = result.log.runs[0]["plans"]["constrained_onf_planner"]["stats"]
        assert stats["min_clearing_distance"] is not None
        assert stats["min_clearing_distance"] >= 0.0
