"""Golden tests for nfopp_tpu.ops.{math,hessian,losses,sampling} vs plain numpy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.ops import hessian, losses, sampling
from nfopp_tpu.ops import math as om


def test_wrap_angle_golden():
    # Compare on the circle (cos/sin) to be robust to float32 rounding at the
    # +-pi branch point, then check the range invariant.
    angles = np.array([0.0, 1.0, -2.5, 3.5 * np.pi, -7.1, 100.0], np.float32)
    got = np.asarray(om.wrap_angle(jnp.asarray(angles)))
    np.testing.assert_allclose(np.cos(got), np.cos(angles), atol=1e-5)
    np.testing.assert_allclose(np.sin(got), np.sin(angles), atol=1e-5)
    out = np.asarray(om.wrap_angle(jnp.asarray(np.random.RandomState(0).randn(1000) * 10)))
    assert (out > -np.pi - 1e-6).all() and (out <= np.pi + 1e-6).all()


def test_unfold_angles_continuous():
    raw = np.cumsum(np.random.RandomState(1).uniform(-0.4, 0.4, 200))
    wrapped = (raw + np.pi) % (2 * np.pi) - np.pi
    unfolded = np.asarray(om.unfold_angles(jnp.asarray(wrapped)))
    deltas = np.diff(unfolded)
    assert np.abs(deltas).max() < np.pi  # no jumps
    np.testing.assert_allclose(np.diff(raw), deltas, atol=1e-5)


def test_sinc_epsilon_clamp():
    x = jnp.asarray([0.0, 1e-6, 0.5, -0.5])
    out = np.asarray(om.sinc(x))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[2], np.sin(0.5) / 0.5, atol=1e-6)


def test_arc_length_cdf():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [1.0, 3.0]])
    cdf = np.asarray(om.arc_length_cdf(jnp.asarray(pts)))
    np.testing.assert_allclose(cdf, [0.0, 0.25, 0.5, 1.0], atol=1e-6)


def test_velocity_hessian_structure():
    h = hessian.velocity_hessian(5)
    assert (np.diag(h) == 4).all()
    assert (np.diag(h, 1) == -2).all() and (np.diag(h, -1) == -2).all()
    inv = hessian.inverse_velocity_hessian(50, 0.5)
    reconstructed = inv @ (0.5 * hessian.velocity_hessian(50) + np.eye(50)).astype(np.float32)
    np.testing.assert_allclose(reconstructed, np.eye(50), atol=1e-4)


def test_bce_with_logits_matches_formula():
    rng = np.random.RandomState(2)
    logits = rng.randn(64, 1).astype(np.float32) * 3
    targets = (rng.rand(64, 1) > 0.5).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-logits))
    expected = -np.mean(targets * np.log(p + 1e-12) + (1 - targets) * np.log(1 - p + 1e-12))
    got = float(losses.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_softplus_beta_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    x = np.linspace(-30, 30, 101).astype(np.float32)
    for beta in [1.0, 10.0]:
        expected = torch.nn.functional.softplus(torch.tensor(x), beta=beta).numpy()
        got = np.asarray(losses.softplus_beta(jnp.asarray(x), beta))
        np.testing.assert_allclose(got, expected, atol=1e-6)


def test_constraint_deltas_zero_for_feasible_motion():
    # Motion exactly along the heading: no lateral slip, forward progress.
    n = 20
    theta = np.full(n, 0.7)
    step = 0.1
    x = np.cumsum(np.full(n, step * np.cos(0.7)))
    y = np.cumsum(np.full(n, step * np.sin(0.7)))
    full = jnp.asarray(np.stack([x, y, theta], axis=1), jnp.float32)
    nh = np.asarray(losses.non_holonomic_constraint_deltas(full))
    np.testing.assert_allclose(nh, 0.0, atol=1e-6)
    fwd = np.asarray(losses.direction_constraint_deltas(full))
    np.testing.assert_allclose(fwd, -step, atol=1e-6)  # negative = forward motion


def test_direction_deltas_positive_for_reverse():
    full = jnp.asarray([[0.0, 0.0, 0.0], [-1.0, 0.0, 0.0]], jnp.float32)
    assert float(losses.direction_constraint_deltas(full)[0]) > 0


def test_distance_loss_se2_gradient_structure():
    """The closure correction must be stop-gradiented exactly as the reference
    detaches it (constrained_nerf_opt_planner.py:125-126)."""
    rng = np.random.RandomState(3)
    traj = jnp.asarray(rng.randn(12, 3), jnp.float32)

    def loss(t):
        return losses.distance_loss_se2(t, angle_weight=0.5)

    g = jax.grad(loss)(traj)
    assert np.isfinite(np.asarray(g)).all()
    # xy gradient equals plain sum-of-squares gradient
    def xy_loss(t):
        d = t[1:, :2] - t[:-1, :2]
        return jnp.sum(d * d)

    g_xy = jax.grad(xy_loss)(traj)
    np.testing.assert_allclose(np.asarray(g)[:, :2], np.asarray(g_xy)[:, :2], atol=1e-5)


def test_boundary_loss():
    traj = jnp.asarray([[0.5, 0.5], [-0.5, 0.5], [0.5, 1.5]], jnp.float32)
    bounds = jnp.asarray([0.0, 1.0, 0.0, 1.0], jnp.float32)
    got = float(losses.boundary_loss(traj, bounds))
    np.testing.assert_allclose(got, 0.25 + 0.25, atol=1e-6)


def test_gumbel_topk_without_replacement_distribution():
    key = jax.random.PRNGKey(0)
    weights = jnp.asarray([10.0, 1.0, 1.0, 0.0], jnp.float32)
    counts = np.zeros(4)
    for i in range(300):
        idx = np.asarray(sampling.gumbel_topk_indices(jax.random.fold_in(key, i), weights, 2))
        assert len(set(idx.tolist())) == 2  # without replacement
        counts[idx] += 1
    assert counts[0] > 280  # heaviest weight nearly always selected
    assert counts[3] < 20  # zero weight (exclusion is soft but strong)


def test_random_intermediate_positions_on_segments():
    key = jax.random.PRNGKey(1)
    traj = jnp.asarray(np.random.RandomState(5).randn(30, 2), jnp.float32)
    pts = np.asarray(sampling.random_intermediate_positions(key, traj))
    assert pts.shape == (29, 2)
    tnp = np.asarray(traj)
    for i in range(29):
        seg = tnp[i + 1] - tnp[i]
        rel = pts[i] - tnp[i]
        denom = seg @ seg
        alpha = (rel @ seg) / denom
        assert -1e-5 <= alpha <= 1 + 1e-5
        np.testing.assert_allclose(rel, alpha * seg, atol=1e-5)


def test_uniform_box_points_in_bounds():
    bounds = jnp.asarray([-2.0, 5.0, 1.0, 4.0], jnp.float32)
    pts = np.asarray(sampling.uniform_box_points(jax.random.PRNGKey(2), 500, bounds, True))
    assert pts.shape == (500, 3)
    assert (pts[:, 0] >= -2).all() and (pts[:, 0] <= 5).all()
    assert (pts[:, 1] >= 1).all() and (pts[:, 1] <= 4).all()
    assert (pts[:, 2] >= 0).all() and (pts[:, 2] <= 2 * np.pi).all()
