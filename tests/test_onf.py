"""Tests for the ONF occupancy field model."""
import numpy as np
import jax
import jax.numpy as jnp

from nfopp_tpu.models import ONFConfig, init_onf_params, onf_apply, onf_param_count


def test_param_count_matches_reference_architecture():
    """use_cos + angle_encoding: 2*200+200 + 20 + 220*100+100 + 100*100+100 +
    320*1+1 = 33141 params (onf_model.py:18-31 + angle_encoder.py:12-14)."""
    cfg = ONFConfig(use_cos=True, angle_encoding=True)
    assert onf_param_count(cfg) == 33141


def test_forward_shapes_and_determinism():
    cfg = ONFConfig(mean=0.0, sigma=1.0, use_cos=True, angle_encoding=True)
    params = init_onf_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(17, 3), jnp.float32)
    out1 = onf_apply(params, x, cfg)
    out2 = onf_apply(params, x, cfg)
    assert out1.shape == (17, 1)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_forward_numpy_golden():
    """Independent numpy recomputation of the documented architecture."""
    cfg = ONFConfig(mean=1.5, sigma=2.0, use_cos=True, angle_encoding=True)
    params = jax.tree_util.tree_map(np.asarray, init_onf_params(jax.random.PRNGKey(3), cfg))
    x = np.random.RandomState(1).randn(9, 3).astype(np.float32)

    xy = (x[:, :2] - 1.5) / 2.0
    enc = xy @ params["encoding"]["w"] + params["encoding"]["b"]
    enc = np.concatenate([np.sin(enc[:, :100]), np.cos(enc[:, 100:])], axis=1)
    freqs = np.concatenate([np.arange(1, 11), np.arange(1, 11)]).astype(np.float32)
    a = (x[:, 2][:, None] + params["angle_biases"][None]) * freqs[None]
    ang = np.concatenate([np.sin(a[:, :10]), np.cos(a[:, 10:])], axis=1)
    feat = np.concatenate([enc, ang], axis=1)
    h = np.maximum(feat @ params["mlp1"]["w"] + params["mlp1"]["b"], 0)
    h = np.maximum(h @ params["mlp2"]["w"] + params["mlp2"]["b"], 0)
    skip = np.concatenate([h, feat], axis=1)
    expected = skip @ params["out"]["w"] + params["out"]["b"]

    got = np.asarray(onf_apply(jax.tree_util.tree_map(jnp.asarray, params), jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_no_angle_encoding_ignores_theta():
    cfg = ONFConfig(use_cos=True, angle_encoding=False)
    params = init_onf_params(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.RandomState(2).randn(5, 2), jnp.float32)
    out = onf_apply(params, x, cfg)
    assert out.shape == (5, 1)


def test_sin_only_variant():
    cfg = ONFConfig(use_cos=False, angle_encoding=False)
    params = init_onf_params(jax.random.PRNGKey(2), cfg)
    assert params["encoding"]["w"].shape == (2, 100)
    out = onf_apply(params, jnp.zeros((3, 2)), cfg)
    assert out.shape == (3, 1)


def test_gradients_flow_to_inputs_and_params():
    cfg = ONFConfig(use_cos=True, angle_encoding=True)
    params = init_onf_params(jax.random.PRNGKey(4), cfg)
    x = jnp.asarray(np.random.RandomState(3).randn(7, 3), jnp.float32)

    gx = jax.grad(lambda q: jnp.sum(onf_apply(params, q, cfg)))(x)
    assert np.abs(np.asarray(gx)).sum() > 0
    gp = jax.grad(lambda p: jnp.sum(onf_apply(p, x, cfg)))(params)
    flat = jax.tree_util.tree_leaves(gp)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert sum(float(jnp.abs(g).sum()) for g in flat) > 0


def test_vmap_over_problem_batch():
    """Each problem trains its own field: batched params + batched points."""
    cfg = ONFConfig(use_cos=True, angle_encoding=True)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    params = jax.vmap(lambda k: init_onf_params(k, cfg))(keys)
    x = jnp.asarray(np.random.RandomState(4).randn(4, 11, 3), jnp.float32)
    out = jax.vmap(lambda p, q: onf_apply(p, q, cfg))(params, x)
    assert out.shape == (4, 11, 1)
    # different fields -> different outputs
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
