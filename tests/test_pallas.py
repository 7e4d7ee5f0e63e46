"""Pallas fused ONF kernel vs the reference jnp implementation.

Runs in interpreter mode on CPU (the TPU compile path is exercised by
bench/profiling runs on hardware).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig, init_onf_params, onf_apply
from nfopp_tpu.experimental.pallas import onf_apply_fused


@pytest.mark.parametrize(
    "config",
    [
        ONFConfig(mean=0.0, sigma=1.0, use_cos=True, angle_encoding=True),
        ONFConfig(mean=1.5, sigma=2.0, use_cos=True, angle_encoding=False),
        ONFConfig(mean=0.0, sigma=5.0, use_cos=False, angle_encoding=False),
    ],
)
def test_fused_matches_reference(config):
    batch, m = 3, 37
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    params = jax.vmap(lambda k: init_onf_params(k, config))(keys)
    dim = 3 if config.angle_encoding else 2
    x = jnp.asarray(np.random.RandomState(1).randn(batch, m, dim) * 2, jnp.float32)

    expected = jax.vmap(lambda p, q: onf_apply(p, q, config))(params, x)
    got = onf_apply_fused(params, x, config, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_fused_large_m_alignment():
    """Unaligned M exercises the row-padding path."""
    config = ONFConfig(use_cos=True, angle_encoding=True)
    params = jax.vmap(lambda k: init_onf_params(k, config))(
        jax.random.split(jax.random.PRNGKey(2), 2)
    )
    x = jnp.asarray(np.random.RandomState(3).randn(2, 131, 3), jnp.float32)
    expected = jax.vmap(lambda p, q: onf_apply(p, q, config))(params, x)
    got = onf_apply_fused(params, x, config, interpret=True)
    assert got.shape == (2, 131, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)
