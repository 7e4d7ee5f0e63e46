"""Fused collision-energy terms for the trajectory update (custom VJP).

The trajectory loss queries the (frozen) field at segment-sampled poses and
needs gradients w.r.t. the QUERY POSITIONS and the interpolated collision
multipliers — not the parameters (constrained_nerf_opt_planner.py:76-100 with
the field's requires_grad_(False), nerf_opt_planner.py:144). The XLA path
materializes the whole [B, 99, 100..320] forward+backward chain to HBM
(profiled HBM-bound); here both passes are single VMEM-resident Pallas kernels
behind a jax.custom_vjp:

    collision_terms(params, positions[M,3], multipliers[M])
        -> (sum softplus_beta(z), sum multipliers * tanh(z))

    vjp: d_positions via the hand-derived input-gradient chain
         (out head -> relu MLP -> Fourier/angle encodings -> x),
         d_multipliers = gbar2 * tanh(z).

Params are treated as non-differentiable here by design — matching the
reference's frozen field during trajectory optimization.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models.onf import ONFConfig
from .onf_fused import _round_up, pad_onf_params

__all__ = ["make_collision_terms"]


def _forward_core(x, config: ONFConfig, refs):
    """Shared forward: returns (fourier_feats, angle_feats, enc, phase, freq,
    pre1, h1, pre2, h2, z[M,128] col0)."""
    (ew, eb, ab, w1a_v, w1b_v, b1_v, w2_v, b2_v, w3h_v, w3a_v, w3b_v, b3_v) = refs
    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics
    m = x.shape[0]

    xn = (x[:, 0:1] - config.mean) / config.sigma
    yn = (x[:, 1:2] - config.mean) / config.sigma
    enc = xn * ew[0:1, :] + yn * ew[1:2, :] + eb[0:1, :]
    colf = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
    if config.use_cos:
        fourier_feats = jnp.where(colf < half, jnp.sin(enc), jnp.cos(enc))
    else:
        fourier_feats = jnp.sin(enc)
    fourier_feats = jnp.where(colf < fourier, fourier_feats, 0.0)

    col128 = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    if config.angle_encoding:
        theta = x[:, 2:3]
        freq = (col128 % harmonics + 1).astype(jnp.float32)
        phase = (theta + ab[0:1, :]) * freq
        angle_feats = jnp.where(col128 < harmonics, jnp.sin(phase), jnp.cos(phase))
        angle_feats = jnp.where(col128 < 2 * harmonics, angle_feats, 0.0)
    else:
        freq = jnp.zeros((m, 128), jnp.float32)
        phase = jnp.zeros((m, 128), jnp.float32)
        angle_feats = jnp.zeros((m, 128), jnp.float32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    pre1 = mm(fourier_feats, w1a_v) + mm(angle_feats, w1b_v) + b1_v[0:1, :]
    h1 = jnp.maximum(pre1, 0.0)
    pre2 = mm(h1, w2_v) + b2_v[0:1, :]
    h2 = jnp.maximum(pre2, 0.0)
    z = mm(h2, w3h_v) + mm(fourier_feats, w3a_v) + mm(angle_feats, w3b_v) + b3_v[0:1, :]
    return fourier_feats, angle_feats, enc, colf, col128, phase, freq, pre1, h1, pre2, h2, z


def _fwd_kernel(x_ref, mult_ref, *param_refs, out_ref, config, valid_rows, beta):
    x = x_ref[0]
    mult = mult_ref[0]
    refs = tuple(r[0] for r in param_refs)
    *_, z = _forward_core(x, config, refs)
    m = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    active = (row < valid_rows) & (col == 0)
    scaled = beta * z
    soft = jnp.where(scaled > 20.0, z, jnp.log1p(jnp.exp(jnp.where(scaled > 20.0, 0.0, scaled))) / beta)
    sum_soft = jnp.sum(jnp.where(active, soft, 0.0))
    sum_mult_tanh = jnp.sum(jnp.where(active, mult[:, 0:1] * jnp.tanh(z), 0.0))
    # no scatter in Mosaic: place the two scalars via masked selects
    orow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ocol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.where(
        (orow == 0) & (ocol == 0), sum_soft,
        jnp.where((orow == 0) & (ocol == 1), sum_mult_tanh, 0.0),
    )
    out_ref[0] = out


def _bwd_kernel(x_ref, mult_ref, g_ref, *param_refs, dx_ref, dmult_ref,
                config, valid_rows, beta):
    x = x_ref[0]
    mult = mult_ref[0]
    refs = tuple(r[0] for r in param_refs)
    (ew, eb, ab, w1a_v, w1b_v, b1_v, w2_v, b2_v, w3h_v, w3a_v, w3b_v, b3_v) = refs
    (fourier_feats, angle_feats, enc, colf, col128, phase, freq,
     pre1, h1, pre2, h2, z) = _forward_core(x, config, refs)

    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics
    m = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
    active = (row < valid_rows) & (col128 == 0)

    g1 = g_ref[0][0, 0]  # cotangent of sum_softplus
    g2 = g_ref[0][0, 1]  # cotangent of sum_mult_tanh
    tanh_z = jnp.tanh(z)
    gz = g1 * jax.nn.sigmoid(beta * z) + g2 * mult[:, 0:1] * (1.0 - tanh_z * tanh_z)
    gz = jnp.where(active, gz, 0.0)  # [M, 128], col 0

    def mm_tb(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    dh2 = jnp.where(pre2 > 0.0, mm_tb(gz, w3h_v), 0.0)
    dh1 = jnp.where(pre1 > 0.0, mm_tb(dh2, w2_v), 0.0)
    dfourier = mm_tb(gz, w3a_v) + mm_tb(dh1, w1a_v)
    dangle = mm_tb(gz, w3b_v) + mm_tb(dh1, w1b_v)

    if config.use_cos:
        denc = jnp.where(colf < half, jnp.cos(enc), -jnp.sin(enc)) * dfourier
    else:
        denc = jnp.cos(enc) * dfourier
    denc = jnp.where(colf < fourier, denc, 0.0)
    # x, y grads through the encoding layer: denc @ ew rows, / sigma
    dxn = jnp.sum(denc * ew[0:1, :], axis=1, keepdims=True) / config.sigma
    dyn = jnp.sum(denc * ew[1:2, :], axis=1, keepdims=True) / config.sigma

    if config.angle_encoding:
        dphase = jnp.where(col128 < harmonics, jnp.cos(phase), -jnp.sin(phase)) * dangle
        dphase = jnp.where(col128 < 2 * harmonics, dphase, 0.0)
        dtheta = jnp.sum(dphase * freq, axis=1, keepdims=True)
    else:
        dtheta = jnp.zeros((m, 1), jnp.float32)

    dx = jnp.zeros((m, 128), jnp.float32)
    col = col128
    dx = jnp.where(col == 0, dxn, dx)
    dx = jnp.where(col == 1, dyn, dx)
    dx = jnp.where(col == 2, dtheta, dx)
    dx_ref[0] = dx

    dmult = jnp.where(active, g2 * tanh_z, 0.0)
    dmult_ref[0] = dmult


def make_collision_terms(config: ONFConfig, beta: float, interpret: bool = False):
    """Build `collision_terms(params, positions[M,3], multipliers[M])` with a
    custom VJP differentiating positions and multipliers only."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    order = ["enc_w", "enc_b", "angle_b", "w1a", "w1b", "b1", "w2", "b2",
             "w3h", "w3a", "w3b", "b3"]

    def spec(shape):
        return pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=pltpu.VMEM)

    def prepare(params, positions, multipliers):
        m, dim = positions.shape
        m_pad = _round_up(m, 8)
        x = jnp.zeros((1, m_pad, 128), jnp.float32)
        x = x.at[0, :m, :dim].set(positions)
        mu = jnp.zeros((1, m_pad, 128), jnp.float32)
        mu = mu.at[0, :m, 0].set(multipliers)
        padded = {k: v[None] for k, v in pad_onf_params(params, config).items()}
        return x, mu, padded, m, m_pad

    @jax.custom_vjp
    def collision_terms(params, positions, multipliers):
        x, mu, padded, m, m_pad = prepare(params, positions, multipliers)
        kernel = functools.partial(
            _fwd_kernel, config=config, valid_rows=m, beta=beta
        )

        def wrapped(*args):
            *ins, out_ref = args
            kernel(*ins[:2], *ins[2:], out_ref=out_ref)

        out = pl.pallas_call(
            wrapped,
            in_specs=[spec(x.shape), spec(mu.shape)]
            + [spec(padded[k].shape) for k in order],
            out_specs=spec((1, 8, 128)),
            out_shape=jax.ShapeDtypeStruct((1, 8, 128), jnp.float32),
            interpret=interpret,
        )(x, mu, *[padded[k] for k in order])
        return out[0, 0, 0], out[0, 0, 1]

    def fwd(params, positions, multipliers):
        return collision_terms(params, positions, multipliers), (
            params, positions, multipliers
        )

    def bwd(residuals, cotangents):
        params, positions, multipliers = residuals
        g1, g2 = cotangents
        x, mu, padded, m, m_pad = prepare(params, positions, multipliers)
        g = jnp.zeros((1, 8, 128), jnp.float32)
        g = g.at[0, 0, 0].set(g1).at[0, 0, 1].set(g2)
        kernel = functools.partial(
            _bwd_kernel, config=config, valid_rows=m, beta=beta
        )

        def wrapped(*args):
            *ins, dx_ref, dmult_ref = args
            kernel(*ins[:3], *ins[3:], dx_ref=dx_ref, dmult_ref=dmult_ref)

        dx, dmult = pl.pallas_call(
            wrapped,
            in_specs=[spec(x.shape), spec(mu.shape), spec(g.shape)]
            + [spec(padded[k].shape) for k in order],
            out_specs=(spec((1, m_pad, 128)), spec((1, m_pad, 128))),
            out_shape=(
                jax.ShapeDtypeStruct((1, m_pad, 128), jnp.float32),
                jax.ShapeDtypeStruct((1, m_pad, 128), jnp.float32),
            ),
            interpret=interpret,
        )(x, mu, g, *[padded[k] for k in order])
        d_positions = dx[0, :m, : positions.shape[1]]
        d_multipliers = dmult[0, :m, 0]
        d_params = jax.tree_util.tree_map(jnp.zeros_like, params)
        return d_params, d_positions, d_multipliers

    collision_terms.defvjp(fwd, bwd)
    return collision_terms
