"""scan_unroll / outer_scan_unroll replicate the step body inside the
compiled loops (amortizing while-loop per-iteration overhead on TPU) without
changing the math: same ops in the same order."""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def solve(unroll, outer, steps=30):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
        scan_unroll=unroll, outer_scan_unroll=outer,
    )
    solver = ConstrainedSolver(cfg, circle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(0), env.start, env.goal,
        jnp.asarray(env.bounds, jnp.float32), oracle,
    )
    state, aux = jax.jit(lambda s, o: solver.run(s, o, steps))(state, oracle)
    return state, aux


class TestScanUnroll:
    def test_matches_no_unroll(self):
        ref_state, ref_aux = solve(1, 1)
        for unroll, outer in [(9, 1), (3, 1), (9, 3), (1, 3)]:
            got_state, got_aux = solve(unroll, outer)
            np.testing.assert_allclose(
                np.asarray(got_state.trajectory),
                np.asarray(ref_state.trajectory),
                atol=1e-5,
                err_msg=f"unroll={unroll} outer={outer}",
            )
            np.testing.assert_allclose(
                np.asarray(got_aux.trajectory_loss),
                np.asarray(ref_aux.trajectory_loss),
                rtol=1e-4,
            )

    def test_non_divisible_outer_clamped(self):
        # 30 steps = 3 chunks; outer_scan_unroll=4 must clamp to 3
        state, aux = solve(1, 4)
        assert np.isfinite(np.asarray(state.trajectory)).all()
        assert aux.trajectory_loss.shape == (30,)
