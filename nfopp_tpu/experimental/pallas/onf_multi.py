"""Multi-problem fused ONF forward: P problems per Pallas program.

The one-problem-per-program kernels (onf_fused.py) lose to XLA's batched
fusions at this workload's sizes: each grid step does ~0.4 MFLOP, so the
pipeline is dominated by per-program latency. Packing P problems into one
program amortizes that overhead P-fold while keeping every problem's weights
and activations VMEM-resident; the Pallas grid pipeline overlaps the next
P-problem block's DMA with compute.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models.onf import ONFConfig
from .onf_fused import _round_up, pad_onf_params

__all__ = ["onf_apply_fused_multi"]

_ORDER = [
    "enc_w", "enc_b", "w1a", "w1b", "b1", "w2", "b2",
    "w3h", "w3a", "w3b", "b3", "angle_b",
]


def _kernel(x_ref, *refs, config: ONFConfig, problems: int, compute):
    *param_refs, out_ref = refs
    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics

    for p in range(problems):
        x = x_ref[p]
        m = x.shape[0]
        (enc_w, enc_b, w1a, w1b, b1, w2, b2, w3h, w3a, w3b, b3, angle_b) = (
            r[p] for r in param_refs
        )
        xn = (x[:, 0:1] - config.mean) / config.sigma
        yn = (x[:, 1:2] - config.mean) / config.sigma
        enc = xn * enc_w[0:1, :] + yn * enc_w[1:2, :] + enc_b[0:1, :]
        colf = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
        if config.use_cos:
            feats = jnp.where(colf < half, jnp.sin(enc), jnp.cos(enc))
        else:
            feats = jnp.sin(enc)
        feats = jnp.where(colf < fourier, feats, 0.0)

        if config.angle_encoding:
            theta = x[:, 2:3]
            acol = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
            freq = (acol % harmonics + 1).astype(jnp.float32)
            phase = (theta + angle_b[0:1, :]) * freq
            angle = jnp.where(acol < harmonics, jnp.sin(phase), jnp.cos(phase))
            angle = jnp.where(acol < 2 * harmonics, angle, 0.0)
        else:
            angle = jnp.zeros((m, 128), jnp.float32)

        def mm(a, b):
            return jnp.dot(
                a.astype(compute), b.astype(compute),
                preferred_element_type=jnp.float32,
            )

        h1 = jnp.maximum(mm(feats, w1a) + mm(angle, w1b) + b1[0:1, :], 0.0)
        h2 = jnp.maximum(mm(h1, w2) + b2[0:1, :], 0.0)
        logits = (
            mm(h2, w3h) + mm(feats, w3a) + mm(angle, w3b) + b3[0:1, :]
        )
        out_ref[p] = logits[:, :1]


def onf_apply_fused_multi(
    params: dict,
    x: jnp.ndarray,
    config: ONFConfig = ONFConfig(),
    problems_per_program: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused forward: params [B, ...], x [B, M, 2|3] -> [B, M, 1].

    B must be divisible by problems_per_program.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch, m, dim = x.shape
    p = problems_per_program
    if batch % p != 0:
        raise ValueError(f"batch {batch} not divisible by {p}")
    m_pad = _round_up(m, 8)
    x_padded = jnp.zeros((batch, m_pad, 128), jnp.float32)
    x_padded = x_padded.at[:, :m, :dim].set(x)
    padded = jax.vmap(lambda q: pad_onf_params(q, config))(params)

    compute = jnp.dtype(config.compute_dtype)
    kernel = functools.partial(
        _kernel, config=config, problems=p, compute=compute
    )

    def spec(arr):
        return pl.BlockSpec(
            (p,) + arr.shape[1:], lambda b: (b,) + (0,) * (arr.ndim - 1),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(batch // p,),
        in_specs=[spec(x_padded)] + [spec(padded[k]) for k in _ORDER],
        out_specs=pl.BlockSpec(
            (p, m_pad, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((batch, m_pad, 1), jnp.float32),
        interpret=interpret,
    )(x_padded, *[padded[k] for k in _ORDER])
    return out[:, :m]
