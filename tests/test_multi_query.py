"""Multi-query planning: K queries on one shared map in a single sharded
batch (`BatchPlanner.solve_multi_query`), with optional shared occupancy
field and per-query restarts."""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.parallel import BatchPlanner, problem_mesh
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    car_environment,
    circle_collision,
    pad_obstacle_points,
)


def car_setup(trajectory_length=24):
    env = car_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 64)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.1),
        jnp.asarray(env.bounds, jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=trajectory_length, collision_point_count=24,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
    )
    solver = ConstrainedSolver(cfg, circle_collision)
    return env, oracle, solver


class TestMultiQuery:
    def test_shared_field_two_queries_with_restarts(self):
        env, oracle, solver = car_setup()
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        starts = jnp.asarray([env.start, env.goal], jnp.float32)
        goals = jnp.asarray([env.goal, env.start], jnp.float32)
        result = planner.solve_multi_query(
            jax.random.PRNGKey(0), starts, goals, env.bounds, oracle,
            restarts=2, max_iterations=100, shared_field=True,
        )
        assert result.path.shape == (2, 26, 3)
        assert np.isfinite(np.asarray(result.path)).all()
        # iterations records when the kept (best feasible) path was found —
        # a multiple of check_freq within the budget (solve_grouped_tracked)
        iters = np.asarray(result.iterations)
        assert ((iters > 0) & (iters <= 100) & (iters % 50 == 0)).all(), iters
        # endpoints pinned per query
        np.testing.assert_allclose(np.asarray(result.path[0, 0]), env.start, atol=1e-5)
        np.testing.assert_allclose(np.asarray(result.path[1, 0]), env.goal, atol=1e-5)

    def test_independent_fields_tracked_solve(self):
        env, oracle, solver = car_setup()
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        starts = jnp.asarray([env.start, env.start], jnp.float32)
        goals = jnp.asarray([env.goal, env.goal], jnp.float32)
        result = planner.solve_multi_query(
            jax.random.PRNGKey(1), starts, goals, env.bounds, oracle,
            restarts=1, max_iterations=100, min_iterations=20, check_freq=20,
            shared_field=False,
        )
        assert result.path.shape == (2, 26, 3)
        assert result.feasible.shape == (2,)
        assert (np.asarray(result.iterations) <= 100).all()

    def test_best_restart_selection_is_per_query(self):
        """_best_per_query on synthetic data: feasible-first, then shortest,
        with query-major index reconstruction."""
        from nfopp_tpu.parallel.batch import _best_per_query
        from nfopp_tpu.solver.tracking import TrackingResult

        # 2 queries x 3 restarts, query-major rows 0-2 / 3-5
        length = jnp.asarray([5.0, 1.0, 9.0, 2.0, 8.0, 3.0])
        feasible = jnp.asarray([True, False, True, False, False, True])
        result = TrackingResult(
            state=jnp.arange(6),
            path=jnp.arange(6, dtype=jnp.float32)[:, None, None],
            length=length,
            feasible=feasible,
            iterations=jnp.full(6, 7, jnp.int32),
        )
        best = _best_per_query(result, k=2, restarts=3)
        # query 0: feasible rows 0 (len 5) and 2 (len 9) -> row 0
        # query 1: only row 5 feasible -> row 5 (despite row 3 being shorter)
        np.testing.assert_array_equal(np.asarray(best.state), [0, 5])
        np.testing.assert_allclose(np.asarray(best.length), [5.0, 3.0])
        np.testing.assert_array_equal(np.asarray(best.feasible), [True, True])

    def test_portfolio_wrapper_shapes(self):
        env, oracle, solver = car_setup(trajectory_length=16)
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        result = planner.solve_portfolio(
            jax.random.PRNGKey(3), env.start, env.goal, env.bounds, oracle,
            restarts=2, max_iterations=50, min_iterations=10, check_freq=10,
        )
        assert result.path.shape == (18, 3)
        assert result.length.shape == ()
        assert result.feasible.shape == ()


class TestGroupedTrackingDeviceSide:
    def test_matches_host_chunk_loop(self):
        """run_grouped_with_tracking (one jitted scan) must reproduce the
        former host-side chunk loop exactly: same chunked run_grouped calls,
        same bookkeeping, so bit-identical paths/lengths/flags on CPU."""
        env, oracle, solver = car_setup()
        planner = BatchPlanner(solver, problem_mesh(jax.devices()[:1]))
        starts = jnp.asarray([env.start, env.start], jnp.float32)
        goals = jnp.asarray([env.goal, env.goal], jnp.float32)
        batch = 2
        oracles = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
        )
        bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
        group_size, max_iterations, min_iterations, check_freq = 2, 100, 20, 20

        def make_states():
            return planner.init_batch_grouped(
                jax.random.PRNGKey(3), starts, goals, bounds, oracles, group_size
            )

        device = planner.solve_grouped_tracked(
            make_states(), oracles, group_size, max_iterations,
            min_iterations, check_freq,
        )

        # the pre-round-3 host loop, inlined
        states = make_states()
        num_chunks = -(-max_iterations // check_freq)
        best_path = np.array(planner.paths(states))
        best_length = np.full(batch, np.inf)
        best_feasible = np.zeros(batch, bool)
        iterations = np.zeros(batch, np.int32)
        path = np.asarray(best_path)
        length = np.full(batch, np.nan)
        feasible = np.zeros(batch, bool)
        for c in range(num_chunks):
            states, _ = planner.run_grouped(states, oracles, check_freq, group_size)
            done = (c + 1) * check_freq
            path = np.asarray(planner.paths(states))
            collides, length = planner._eval_paths(oracles, jnp.asarray(path))
            feasible = ~np.asarray(collides)
            length = np.asarray(length)
            better = (done > min_iterations) & feasible & (length < best_length)
            best_path[better] = path[better]
            best_length[better] = length[better]
            best_feasible |= better
            iterations[better] = done
        no_best = ~best_feasible
        best_path[no_best] = path[no_best]
        best_length[no_best] = length[no_best]
        iterations[no_best] = num_chunks * check_freq
        feasible_out = best_feasible | (no_best & feasible)

        np.testing.assert_array_equal(np.asarray(device.path), best_path)
        np.testing.assert_array_equal(
            np.asarray(device.length), best_length.astype(np.float32)
        )
        np.testing.assert_array_equal(np.asarray(device.feasible), feasible_out)
        np.testing.assert_array_equal(np.asarray(device.iterations), iterations)
