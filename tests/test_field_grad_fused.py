"""Fused field-training kernel vs jax.grad reference (interpreter mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig, init_onf_params
from nfopp_tpu.experimental.pallas.field_grad import field_loss_and_grad_fused
from nfopp_tpu.solver import SolverConfig
from nfopp_tpu.solver.field import field_loss_and_grad


@pytest.mark.parametrize(
    "onf",
    [
        ONFConfig(mean=0.0, sigma=1.0, use_cos=True, angle_encoding=True),
        ONFConfig(mean=1.0, sigma=3.0, use_cos=True, angle_encoding=False),
        ONFConfig(mean=0.0, sigma=1.0, use_cos=False, angle_encoding=False),
    ],
)
def test_fused_loss_and_grads_match(onf):
    params = init_onf_params(jax.random.PRNGKey(0), onf)
    rng = np.random.RandomState(1)
    m = 53
    dim = 3 if onf.angle_encoding else 2
    points = jnp.asarray(rng.randn(m, dim) * 2, jnp.float32)
    truth = jnp.asarray(rng.rand(m) > 0.5)

    cfg = SolverConfig(onf=onf)
    ref_loss, ref_grads = field_loss_and_grad(cfg, params, points, truth)
    got_loss, got_grads = field_loss_and_grad_fused(onf, params, points, truth, interpret=True)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5, atol=1e-6)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_grads)
    got_flat = dict(
        ("/".join(str(k) for k in path), leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(got_grads)
    )
    for path, ref_leaf in ref_flat:
        name = "/".join(str(k) for k in path)
        got_leaf = got_flat[name]
        assert got_leaf.shape == ref_leaf.shape, name
        np.testing.assert_allclose(
            np.asarray(got_leaf), np.asarray(ref_leaf), rtol=2e-4, atol=2e-5,
            err_msg=f"gradient mismatch for {name}",
        )


def test_fused_vmaps_over_problems():
    onf = ONFConfig(use_cos=True, angle_encoding=True)
    batch = 3
    params = jax.vmap(lambda k: init_onf_params(k, onf))(
        jax.random.split(jax.random.PRNGKey(2), batch)
    )
    rng = np.random.RandomState(3)
    points = jnp.asarray(rng.randn(batch, 40, 3), jnp.float32)
    truth = jnp.asarray(rng.rand(batch, 40) > 0.5)
    loss, grads = jax.vmap(
        lambda p, x, t: field_loss_and_grad_fused(onf, p, x, t, interpret=True)
    )(params, points, truth)
    assert loss.shape == (batch,)
    assert grads["mlp1"]["w"].shape == (batch, 220, 100)
    assert np.isfinite(np.asarray(loss)).all()
