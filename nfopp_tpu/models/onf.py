"""ONF — the neural occupancy field, as a pure functional JAX model.

Architecture replicates the reference `onf_model.py:7-50` + `angle_encoder.py:10-22`:

    x[M, 3] --theta--> AngleEncoder: sin/cos((theta + b_i) * f_i), f_i = 1..H  -> [M, 2H]
    x[M, 2] --> (x - mean) / sigma --> Linear(2 -> F) --> fourier: sin / [sin|cos] -> [M, F]
    concat -> [M, F + 2H] --> Linear(-> 100) + ReLU --> Linear(-> 100) + ReLU
    skip-concat input features -> [M, 100 + F + 2H] --> Linear(-> 1) -> logits [M, 1]

F = 200 when use_cos else 100; H = 10 (angle harmonics). ~33k parameters.

Parameters live in a flat dict pytree so the model vmaps over a problem batch
(each planning problem trains its own field) and feeds the Pallas fused kernel
(`nfopp_tpu.experimental.pallas`) without framework overhead. Initialization matches
torch.nn.Linear defaults (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights+biases)
with the optional N(0, 1) encoding-layer init (`use_normal_init`,
onf_model.py:30-31) and U(-pi, pi) angle-encoder biases (angle_encoder.py:14).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ONFConfig", "init_onf_params", "onf_apply", "angle_encode", "onf_param_count"]


class ONFConfig(NamedTuple):
    """Static (hashable) architecture configuration for the field MLP.

    compute_dtype: 'float32' (reference parity) or 'bfloat16' (matmuls run on
    the MXU at double rate with f32 accumulation; parameters and gradients stay
    f32 — mixed precision).
    """

    mean: float = 0.0
    sigma: float = 1.0
    use_cos: bool = True
    use_normal_init: bool = True
    bias: bool = True
    angle_encoding: bool = True
    angle_harmonics: int = 10
    hidden: int = 100
    compute_dtype: str = "float32"

    @property
    def fourier_features(self) -> int:
        return 200 if self.use_cos else 100

    @property
    def angle_features(self) -> int:
        return 2 * self.angle_harmonics if self.angle_encoding else 0

    @property
    def feature_dim(self) -> int:
        return self.fourier_features + self.angle_features


def _linear_init(key: jax.Array, fan_in: int, fan_out: int, bias: bool):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(float(fan_in))
    w = jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = (
        jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
        if bias
        else jnp.zeros((fan_out,), jnp.float32)
    )
    return {"w": w, "b": b}


def init_onf_params(key: jax.Array, config: ONFConfig = ONFConfig()) -> dict:
    """Initialize the field parameter pytree."""
    keys = jax.random.split(key, 5)
    fourier = config.fourier_features
    encoding = _linear_init(keys[0], 2, fourier, config.bias)
    if config.use_normal_init:
        encoding["w"] = jax.random.normal(keys[0], (2, fourier), jnp.float32)
    params = {
        "encoding": encoding,
        "mlp1": _linear_init(keys[1], config.feature_dim, config.hidden, True),
        "mlp2": _linear_init(keys[2], config.hidden, config.hidden, True),
        "out": _linear_init(keys[3], config.hidden + config.feature_dim, 1, True),
    }
    if config.angle_encoding:
        h = config.angle_harmonics
        params["angle_biases"] = jax.random.uniform(
            keys[4], (2 * h,), jnp.float32, -jnp.pi, jnp.pi
        )
    return params


def angle_encode(biases: jnp.ndarray, theta: jnp.ndarray, harmonics: int) -> jnp.ndarray:
    """[M] angles -> [M, 2H] learned-phase Fourier features (angle_encoder.py:15-18).

    Frequencies are the fixed ramp 1..H duplicated for the sin and cos halves;
    only the per-feature phase offsets are learnable.
    """
    freqs = jnp.arange(1, harmonics + 1, dtype=theta.dtype)
    frequencies = jnp.concatenate([freqs, freqs])
    x = (theta[:, None] + biases[None, :]) * frequencies[None, :]
    return jnp.concatenate([jnp.sin(x[:, :harmonics]), jnp.cos(x[:, harmonics:])], axis=1)


def onf_apply(params: dict, x: jnp.ndarray, config: ONFConfig = ONFConfig()) -> jnp.ndarray:
    """Field forward pass: [M, 2|3] query poses -> [M, 1] occupancy logits.

    Concatenation-free formulation: the reference concatenates [fourier|angle]
    features and later [hidden|features] for the skip head (onf_model.py:44-48);
    here the mlp1/out weight matrices are SLICED along the contraction dim and
    the partial matmuls summed — identical math (up to f32 reassociation), but
    no [M, 220]/[M, 320] concatenated activations materialize (profiled at
    ~9% of TPU step time as HBM-bound concatenates).
    """
    compute = jnp.dtype(config.compute_dtype)

    def mm(a, w):
        return jax.lax.dot_general(
            a.astype(compute), w.astype(compute),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    fourier = config.fourier_features
    hid = config.hidden
    xy = (x[:, :2] - config.mean) / config.sigma
    enc = mm(xy, params["encoding"]["w"])
    if config.bias:
        # bias=False must mean NO trainable bias (ref nn.Linear(bias=False),
        # onf_model.py:29): the zero leaf stays in the pytree for structural
        # stability, but an unused leaf gets zero grads, so Adam never moves it
        enc = enc + params["encoding"]["b"]
    if config.use_cos:
        h = fourier // 2
        enc = jnp.concatenate([jnp.sin(enc[:, :h]), jnp.cos(enc[:, h:])], axis=1)
    else:
        enc = jnp.sin(enc)

    w1 = params["mlp1"]["w"]
    w3 = params["out"]["w"]
    if config.angle_encoding:
        angle = angle_encode(params["angle_biases"], x[:, 2], config.angle_harmonics)
        pre1 = mm(enc, w1[:fourier]) + mm(angle, w1[fourier:]) + params["mlp1"]["b"]
    else:
        angle = None
        pre1 = mm(enc, w1) + params["mlp1"]["b"]
    hidden = jax.nn.relu(pre1)
    hidden = jax.nn.relu(mm(hidden, params["mlp2"]["w"]) + params["mlp2"]["b"])
    logits = mm(hidden, w3[:hid]) + mm(enc, w3[hid : hid + fourier]) + params["out"]["b"]
    if angle is not None:
        logits = logits + mm(angle, w3[hid + fourier :])
    return logits


def onf_param_count(config: ONFConfig = ONFConfig()) -> int:
    params = init_onf_params(jax.random.PRNGKey(0), config)
    return sum(p.size for p in jax.tree_util.tree_leaves(params))
