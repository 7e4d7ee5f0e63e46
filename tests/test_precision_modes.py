"""Implementation-switch tests: bf16 compute and the fused field kernel must
preserve solver behavior (not bit-exact; statistically equivalent)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig, run_planner_config
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def setup(config, use_fused_field_grad=False):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    if use_fused_field_grad:
        from nfopp_tpu.experimental import ExperimentalConstrainedSolver

        solver = ExperimentalConstrainedSolver(
            config, circle_collision, use_fused_field_grad=True
        )
    else:
        solver = ConstrainedSolver(config, circle_collision)
    state = solver.init_state(
        jax.random.PRNGKey(0), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    return solver, state, oracle


def test_bf16_forward_close_to_f32():
    """Single forward pass: bf16 matmuls with f32 accumulation stay within
    bf16 rounding of the f32 logits. (Trajectory-level closeness is NOT a
    valid assertion: Adam's per-coordinate sign-like updates turn any rounding
    into a full ±lr step difference immediately — quality equivalence is
    asserted by the solve test below and at the benchmark level.)"""
    from nfopp_tpu.models import init_onf_params, onf_apply

    cfg32 = ONFConfig(angle_encoding=True)
    cfg16 = cfg32._replace(compute_dtype="bfloat16")
    params = init_onf_params(jax.random.PRNGKey(0), cfg32)
    x = jnp.asarray(np.random.RandomState(0).randn(64, 3), jnp.float32)
    out32 = np.asarray(onf_apply(params, x, cfg32))
    out16 = np.asarray(onf_apply(params, x, cfg16))
    scale = np.abs(out32).mean() + 1.0
    assert np.abs(out32 - out16).max() < 0.05 * scale


def test_bf16_solver_quality_preserved():
    """A bf16 solve of the two-wall scene stays finite and produces a sane
    path (full quality equivalence measured on TPU: identical 0.996
    feasibility at the 1000-iteration benchmark)."""
    cfg16 = run_planner_config()
    cfg16 = cfg16._replace(onf=cfg16.onf._replace(compute_dtype="bfloat16"))
    solver, state, oracle = setup(cfg16)
    out, aux = jax.jit(lambda s, o: solver.run(s, o, 200))(state, oracle)
    assert np.isfinite(np.asarray(out.trajectory)).all()
    assert np.isfinite(np.asarray(aux.field_loss)).all()
    assert float(aux.field_loss[-1]) < float(aux.field_loss[0])
    path = np.asarray(solver.full_trajectory(out))
    assert (path[:, 0] > -0.5).all() and (path[:, 0] < 3.5).all()


def test_fused_field_grad_solver_short_horizon():
    """Fused-kernel solve (interpreter on CPU) matches the XLA path closely."""
    base = SolverConfig(
        trajectory_length=12,
        collision_point_count=12,
        random_field_points=4,
        onf=ONFConfig(angle_encoding=True),
        angle_offset=0.3,
    )
    s_ref, state_ref, oracle = setup(base)
    s_fused, state_fused, _ = setup(base, use_fused_field_grad=True)
    out_ref, _ = jax.jit(lambda s, o: s_ref.run(s, o, 5))(state_ref, oracle)
    out_fused, _ = jax.jit(lambda s, o: s_fused.run(s, o, 5))(state_fused, oracle)
    np.testing.assert_allclose(
        np.asarray(out_fused.trajectory), np.asarray(out_ref.trajectory), atol=5e-4
    )
