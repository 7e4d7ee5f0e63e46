"""Fused collision-terms kernel (custom VJP) vs the XLA reference path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig, init_onf_params, onf_apply
from nfopp_tpu.ops.losses import softplus_beta
from nfopp_tpu.experimental.pallas.collision_terms import make_collision_terms


@pytest.mark.parametrize("beta", [1.0, 10.0])
@pytest.mark.parametrize("angle", [True, False])
def test_forward_and_grads_match(beta, angle):
    onf = ONFConfig(mean=0.5, sigma=2.0, use_cos=True, angle_encoding=angle)
    params = init_onf_params(jax.random.PRNGKey(0), onf)
    rng = np.random.RandomState(1)
    m = 33
    dim = 3 if angle else 2
    positions = jnp.asarray(rng.randn(m, dim) * 1.5, jnp.float32)
    multipliers = jnp.asarray(rng.rand(m), jnp.float32)

    def reference(pos, mult):
        logits = onf_apply(params, pos, onf)
        return (
            jnp.sum(softplus_beta(logits, beta)),
            jnp.sum(mult * jnp.tanh(logits[:, 0])),
        )

    terms = make_collision_terms(onf, beta, interpret=True)

    ref_out = reference(positions, multipliers)
    got_out = terms(params, positions, multipliers)
    np.testing.assert_allclose(float(got_out[0]), float(ref_out[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got_out[1]), float(ref_out[1]), rtol=1e-5, atol=1e-5)

    # combined scalar loss, as used in trajectory_loss
    w1, w2 = 3.0, 1.0

    def ref_loss(pos, mult):
        a, b = reference(pos, mult)
        return w1 * a + w2 * b

    def got_loss(pos, mult):
        a, b = terms(params, pos, mult)
        return w1 * a + w2 * b

    ref_dp, ref_dm = jax.grad(ref_loss, argnums=(0, 1))(positions, multipliers)
    got_dp, got_dm = jax.grad(got_loss, argnums=(0, 1))(positions, multipliers)
    np.testing.assert_allclose(np.asarray(got_dp), np.asarray(ref_dp), rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dm), np.asarray(ref_dm), rtol=5e-4, atol=1e-6)


def test_solver_with_fused_collision_terms():
    """Short fused-solver run tracks the XLA solver closely (same RNG)."""
    from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
    from nfopp_tpu.worlds import (
        CircleOracle, circle_collision, pad_obstacle_points, two_walls_se2_environment,
    )

    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    base = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
    )
    ref_solver = ConstrainedSolver(base, circle_collision)
    from nfopp_tpu.experimental import ExperimentalConstrainedSolver
    fused_solver = ExperimentalConstrainedSolver(base, circle_collision, use_fused_field_grad=True)
    s0 = ref_solver.init_state(
        jax.random.PRNGKey(0), env.start, env.goal, jnp.asarray(env.bounds), oracle
    )
    ref_out, _ = jax.jit(lambda s, o: ref_solver.run(s, o, 5))(s0, oracle)
    fused_out, _ = jax.jit(lambda s, o: fused_solver.run(s, o, 5))(s0, oracle)
    np.testing.assert_allclose(
        np.asarray(fused_out.trajectory), np.asarray(ref_out.trajectory), atol=2e-3
    )
