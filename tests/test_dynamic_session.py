"""Device-true dynamic-obstacle session (service.dynamic_replan_session)."""
import jax
import jax.numpy as jnp
import numpy as np

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.service import advance_along_path, dynamic_replan_session
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import CircleOracle, circle_collision


class TestAdvanceAlongPath:
    def test_mid_segment(self):
        path = jnp.asarray(
            [[0.0, 0.0, 0.0], [1.0, 0.0, 0.5], [1.0, 2.0, 1.0]], jnp.float32
        )
        got = np.asarray(advance_along_path(path, jnp.float32(1.5)))
        np.testing.assert_allclose(got[:2], [1.0, 0.5], atol=1e-6)
        assert abs(got[2] - 1.0) < 1e-6  # heading of the entered segment end

    def test_clamped_at_end(self):
        path = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.3]], jnp.float32)
        got = np.asarray(advance_along_path(path, jnp.float32(5.0)))
        np.testing.assert_allclose(got[:2], [1.0, 0.0], atol=1e-6)

    def test_zero_distance_stays(self):
        path = jnp.asarray(
            [[2.0, 3.0, 0.1], [4.0, 3.0, 0.2]], jnp.float32
        )
        got = np.asarray(advance_along_path(path, jnp.float32(0.0)))
        np.testing.assert_allclose(got[:2], [2.0, 3.0], atol=1e-6)


class TestDynamicSession:
    def test_moving_obstacle_session_runs_and_freezes_at_goal(self):
        cfg = SolverConfig(
            trajectory_length=16, collision_point_count=16,
            random_field_points=4, onf=ONFConfig(angle_encoding=True),
            angle_offset=0.3,
        )
        solver = ConstrainedSolver(cfg, circle_collision)
        bounds = jnp.asarray([0.0, 4.0, 0.0, 2.0], jnp.float32)
        start = jnp.asarray([0.3, 1.0, 0.0], jnp.float32)
        goal = jnp.asarray([3.7, 1.0, 0.0], jnp.float32)
        capacity, cycles = 8, 40
        mask = np.zeros(capacity, bool)
        mask[:4] = True
        xs = np.full((cycles, capacity, 2), 1e9, np.float32)
        for c in range(cycles):  # tiny disc bobbing near x=2
            y = 0.4 + 1.2 * abs(np.sin(c * 0.2))
            xs[c, :4] = [[2.0, y], [2.1, y], [2.0, y + 0.1], [1.9, y]]
        mask_j = jnp.asarray(mask)

        def builder(points_t):
            return CircleOracle(points_t, mask_j, jnp.float32(0.2), bounds)

        oracle0 = builder(jnp.asarray(xs[0]))
        state = solver.init_state(
            jax.random.PRNGKey(0), start, goal, bounds, oracle0
        )
        session = jax.jit(
            lambda st, x: dynamic_replan_session(
                solver, st, builder, x, goal, steps_per_cycle=10,
                step_dist=0.15,
            )
        )
        out, aux = session(state, jnp.asarray(xs))
        poses = np.asarray(aux.pose)
        assert poses.shape == (cycles, 3)
        assert np.isfinite(poses).all()
        assert aux.plan.shape == (cycles, 18, 3)
        reached = np.asarray(aux.reached)
        # 40 cycles x 0.15 = 6.0 > 3.4 route: must reach, then freeze
        assert bool(reached[-1])
        k = int(np.argmax(reached))
        frozen = poses[k + 1 :]
        if len(frozen):
            np.testing.assert_allclose(
                frozen, np.tile(frozen[0], (len(frozen), 1)), atol=1e-5
            )
        # reached means within tolerance of the goal
        assert np.linalg.norm(poses[k, :2] - np.asarray(goal[:2])) < 0.2 + 0.16

    def test_session_is_deterministic(self):
        """Same state + same script => bit-identical traces (the timing
        methodology warms with a DIFFERENT script, so replay caching can't
        fake the timed run — this pins that the program itself is pure)."""
        cfg = SolverConfig(
            trajectory_length=12, collision_point_count=12,
            random_field_points=4, onf=ONFConfig(angle_encoding=True),
            angle_offset=0.3,
        )
        solver = ConstrainedSolver(cfg, circle_collision)
        bounds = jnp.asarray([0.0, 4.0, 0.0, 2.0], jnp.float32)
        start = jnp.asarray([0.3, 1.0, 0.0], jnp.float32)
        goal = jnp.asarray([3.7, 1.0, 0.0], jnp.float32)
        mask_j = jnp.asarray(np.ones(4, bool))
        xs = np.tile(
            np.asarray([[2.0, 0.5], [2.0, 0.7], [2.1, 0.6], [1.9, 0.6]],
                       np.float32)[None],
            (10, 1, 1),
        )

        def builder(points_t):
            return CircleOracle(points_t, mask_j, jnp.float32(0.2), bounds)

        state = solver.init_state(
            jax.random.PRNGKey(3), start, goal, bounds, builder(jnp.asarray(xs[0]))
        )
        session = jax.jit(
            lambda st, x: dynamic_replan_session(
                solver, st, builder, x, goal, 10, 0.1
            )
        )
        _, a1 = session(state, jnp.asarray(xs))
        _, a2 = session(state, jnp.asarray(xs))
        np.testing.assert_array_equal(np.asarray(a1.pose), np.asarray(a2.pose))
        np.testing.assert_array_equal(np.asarray(a1.plan), np.asarray(a2.plan))


class TestFleetDynamicSession:
    def _setup(self):
        from nfopp_tpu.service import fleet_dynamic_session  # noqa: F401

        cfg = SolverConfig(
            trajectory_length=12, collision_point_count=12,
            random_field_points=4, onf=ONFConfig(angle_encoding=True),
            angle_offset=0.3,
        )
        solver = ConstrainedSolver(cfg, circle_collision)
        bounds = jnp.asarray([0.0, 4.0, 0.0, 2.0], jnp.float32)
        mask_j = jnp.asarray(np.ones(4, bool))
        cycles = 12
        xs = np.full((cycles, 4, 2), 1e9, np.float32)
        for c in range(cycles):
            y = 0.4 + 1.2 * abs(np.sin(c * 0.25))
            xs[c] = [[2.0, y], [2.1, y], [2.0, y + 0.1], [1.9, y]]

        def builder(points_t):
            return CircleOracle(points_t, mask_j, jnp.float32(0.2), bounds)

        return solver, bounds, builder, jnp.asarray(xs)

    def test_fleet_matches_single_robot_session(self):
        """A 1-robot fleet with group_size=1 must reproduce
        dynamic_replan_session's trace (same per-robot RNG stream as the
        vmapped run; the grouped step with group 1 is the plain step)."""
        from nfopp_tpu.service import fleet_dynamic_session

        solver, bounds, builder, xs = self._setup()
        start = jnp.asarray([0.3, 1.0, 0.0], jnp.float32)
        goal = jnp.asarray([3.7, 1.0, 0.0], jnp.float32)
        state = solver.init_state(
            jax.random.PRNGKey(0), start, goal, bounds, builder(xs[0])
        )
        _, aux_1 = jax.jit(lambda st, x: dynamic_replan_session(
            solver, st, builder, x, goal, 10, 0.15,
        ))(state, xs)
        states_f = jax.tree_util.tree_map(lambda x: x[None], state)
        _, aux_f = jax.jit(lambda st, x: fleet_dynamic_session(
            solver, st, builder, x, goal[None], 10, 0.15, group_size=1,
        ))(states_f, xs)
        np.testing.assert_allclose(
            np.asarray(aux_f.pose[:, 0]), np.asarray(aux_1.pose), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(aux_f.reached[:, 0]), np.asarray(aux_1.reached)
        )

    def test_fleet_dynamic_runs_and_freezes(self):
        """4 robots, crossing routes, shared moving world, one shared field:
        all traces finite, per-robot goal freeze, per-group lockstep."""
        from nfopp_tpu.service import fleet_dynamic_session

        solver, bounds, builder, xs = self._setup()
        starts = jnp.asarray(
            [[0.3, 0.6, 0.0], [0.3, 1.4, 0.0], [3.7, 0.6, 3.14],
             [3.7, 1.4, 3.14]], jnp.float32
        )
        goals = jnp.asarray(
            [[3.7, 0.6, 0.0], [3.7, 1.4, 0.0], [0.3, 0.6, 3.14],
             [0.3, 1.4, 3.14]], jnp.float32
        )
        kp, kf = jax.random.split(jax.random.PRNGKey(1))
        fkeys = jnp.tile(kf[None], (4, 1))
        states = jax.vmap(
            lambda k, fk, s, g: solver.init_state(
                k, s, g, bounds, builder(xs[0]), field_key=fk
            )
        )(jax.random.split(kp, 4), fkeys, starts, goals)
        out, aux = jax.jit(lambda st, x: fleet_dynamic_session(
            solver, st, builder, x, goals, 10, 0.4, group_size=4,
        ))(states, xs)
        assert aux.pose.shape == (12, 4, 3)
        assert np.isfinite(np.asarray(aux.pose)).all()
        assert np.isfinite(np.asarray(aux.path_length)).all()
        reached = np.asarray(aux.reached)
        assert reached[-1].all()  # 12 cycles x 0.4 = 4.8 > 3.4 route
        for leaf in jax.tree_util.tree_leaves(out.field_params):
            a = np.asarray(leaf)
            np.testing.assert_array_equal(a[0], a[-1])  # shared-field lockstep
