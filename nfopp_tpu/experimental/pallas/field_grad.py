"""Fused field-training kernel: BCE loss + ALL parameter gradients in one pass.

The field-update step is the solver's dominant cost (~17.6 of 20.7 us/step/
problem, scripts/profile_step2.py): XLA splinters the forward+backward of the
tiny per-problem MLP into dozens of small HBM-bound fusions. This kernel
computes, per problem, in one VMEM-resident pass:

    forward:  normalize -> Fourier/angle features -> relu MLP -> skip head
    loss:     mean binary cross entropy on logits vs oracle truth
    backward: gradients for every parameter tensor

Field training needs NO input gradients (sample points are constants), which
makes the backward pure matmuls against stored activations — ideal MXU work.
Weight tensors are zero-padded and SPLIT at lane boundaries (see onf_fused.py)
so no unaligned concatenation happens on-chip; gradients come back in the same
split layout and are re-assembled into the standard parameter pytree outside
the kernel (cheap slices, fused by XLA into the optimizer update).

Exposed as `field_loss_and_grad_fused`, a drop-in for
`solver.field.field_loss_and_grad` (select with SolverConfig.use_fused_field_grad).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models.onf import ONFConfig
from .onf_fused import _round_up, pad_onf_params

__all__ = ["field_loss_and_grad_fused"]


def _kernel(
    x_ref, y_ref,
    enc_w, enc_b, w1a, w1b, b1, w2, b2, w3h, w3a, w3b, b3, angle_b,
    loss_ref, d_enc_w, d_enc_b, d_w1a, d_w1b, d_b1, d_w2, d_b2,
    d_w3h, d_w3a, d_w3b, d_b3, d_angle_b,
    *, config: ONFConfig, valid_rows: int,
):
    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics

    x = x_ref[0]  # [M, 128]
    y = y_ref[0]  # [M, 128], truth in col 0
    m = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
    col128 = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    row_valid = row < valid_rows  # [M, 128]

    ew, eb, ab = enc_w[0], enc_b[0], angle_b[0]
    w1a_v, w1b_v, b1_v = w1a[0], w1b[0], b1[0]
    w2_v, b2_v = w2[0], b2[0]
    w3h_v, w3a_v, w3b_v, b3_v = w3h[0], w3a[0], w3b[0], b3[0]

    xn = (x[:, 0:1] - config.mean) / config.sigma
    yn = (x[:, 1:2] - config.mean) / config.sigma

    # ---------------------------------------------------------- forward
    enc = xn * ew[0:1, :] + yn * ew[1:2, :] + eb[0:1, :]
    colf = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
    if config.use_cos:
        fourier_feats = jnp.where(colf < half, jnp.sin(enc), jnp.cos(enc))
    else:
        fourier_feats = jnp.sin(enc)
    fourier_feats = jnp.where(colf < fourier, fourier_feats, 0.0)

    if config.angle_encoding:
        theta = x[:, 2:3]
        freq = (col128 % harmonics + 1).astype(jnp.float32)
        phase = (theta + ab[0:1, :]) * freq
        angle_feats = jnp.where(col128 < harmonics, jnp.sin(phase), jnp.cos(phase))
        angle_feats = jnp.where(col128 < 2 * harmonics, angle_feats, 0.0)
    else:
        phase = jnp.zeros((m, 128), jnp.float32)
        freq = jnp.zeros((m, 128), jnp.float32)
        angle_feats = jnp.zeros((m, 128), jnp.float32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def mm_tb(a, b):
        """a @ b.T via dimension numbers (contract both last dims)."""
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def mm_ta(a, b):
        """a.T @ b (contract both first dims)."""
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    pre1 = mm(fourier_feats, w1a_v) + mm(angle_feats, w1b_v) + b1_v[0:1, :]
    h1 = jnp.maximum(pre1, 0.0)
    pre2 = mm(h1, w2_v) + b2_v[0:1, :]
    h2 = jnp.maximum(pre2, 0.0)
    logits = (
        mm(h2, w3h_v) + mm(fourier_feats, w3a_v) + mm(angle_feats, w3b_v)
        + b3_v[0:1, :]
    )  # [M, 128], col 0 meaningful

    # ------------------------------------------------------- loss + dlogits
    active = row_valid & (col128 == 0)
    z = logits
    bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
    inv_n = 1.0 / float(valid_rows)
    loss = jnp.sum(jnp.where(active, bce, 0.0)) * inv_n
    loss_ref[0] = jnp.full((8, 128), loss, jnp.float32)

    g = jnp.where(active, (jax.nn.sigmoid(z) - y) * inv_n, 0.0)  # [M, 128]

    # ------------------------------------------------------------ backward
    d_w3h[0] = mm_ta(h2, g)
    d_w3a[0] = mm_ta(fourier_feats, g)
    d_w3b[0] = mm_ta(angle_feats, g)
    gsum = jnp.sum(g, axis=0, keepdims=True)  # [1, 128]
    d_b3[0] = jnp.concatenate([gsum, jnp.zeros((7, 128), jnp.float32)], axis=0)

    dh2 = jnp.where(pre2 > 0.0, mm_tb(g, w3h_v), 0.0)
    d_w2[0] = mm_ta(h1, dh2)
    d2sum = jnp.sum(dh2, axis=0, keepdims=True)
    d_b2[0] = jnp.concatenate([d2sum, jnp.zeros((7,) + d2sum.shape[1:], jnp.float32)], axis=0)

    dh1 = jnp.where(pre1 > 0.0, mm_tb(dh2, w2_v), 0.0)
    d_w1a[0] = mm_ta(fourier_feats, dh1)
    d_w1b[0] = mm_ta(angle_feats, dh1)
    d1sum = jnp.sum(dh1, axis=0, keepdims=True)
    d_b1[0] = jnp.concatenate([d1sum, jnp.zeros((7,) + d1sum.shape[1:], jnp.float32)], axis=0)

    dfourier = mm_tb(g, w3a_v) + mm_tb(dh1, w1a_v)  # [M, Fp]
    if config.use_cos:
        denc = jnp.where(colf < half, jnp.cos(enc), -jnp.sin(enc)) * dfourier
    else:
        denc = jnp.cos(enc) * dfourier
    denc = jnp.where(colf < fourier, denc, 0.0)
    dw0 = jnp.sum(xn * denc, axis=0, keepdims=True)
    dw1 = jnp.sum(yn * denc, axis=0, keepdims=True)
    dbe = jnp.sum(denc, axis=0, keepdims=True)
    zeros6 = jnp.zeros((6,) + dw0.shape[1:], jnp.float32)
    d_enc_w[0] = jnp.concatenate([dw0, dw1, zeros6], axis=0)
    d_enc_b[0] = jnp.concatenate(
        [dbe, jnp.zeros((7,) + dbe.shape[1:], jnp.float32)], axis=0
    )

    if config.angle_encoding:
        dangle = mm_tb(g, w3b_v) + mm_tb(dh1, w1b_v)  # [M, 128]
        dphase = jnp.where(col128 < harmonics, jnp.cos(phase), -jnp.sin(phase)) * dangle
        dphase = jnp.where(col128 < 2 * harmonics, dphase, 0.0)
        dab = jnp.sum(dphase * freq, axis=0, keepdims=True)
    else:
        dab = jnp.zeros((1, 128), jnp.float32)
    d_angle_b[0] = jnp.concatenate([dab, jnp.zeros((7, 128), jnp.float32)], axis=0)


def field_loss_and_grad_fused(
    config: ONFConfig,
    params: dict,
    points: jnp.ndarray,
    truth: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """(mean BCE loss, param-grad pytree) for ONE problem; vmap over batches.

    points [M, 2|3], truth [M] bool/float. Matches
    `solver.field.field_loss_and_grad` up to f32 reassociation WHEN
    compute_dtype is float32: the kernel always multiplies in f32 (MXU
    preferred_element_type), so under compute_dtype='bfloat16' the XLA path's
    bf16 matmuls and this kernel legitimately diverge — switching
    use_fused_field_grad is numerics-preserving only in full f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fourier = config.fourier_features
    feat = config.feature_dim
    hidden = config.hidden
    fourier_p = _round_up(fourier, 128)
    hidden_p = _round_up(hidden, 128)

    m, dim = points.shape
    m_pad = _round_up(m, 8)
    x_padded = jnp.zeros((1, m_pad, 128), jnp.float32)
    x_padded = x_padded.at[0, :m, :dim].set(points)
    y_padded = jnp.zeros((1, m_pad, 128), jnp.float32)
    y_padded = y_padded.at[0, :m, 0].set(truth.astype(jnp.float32))

    padded = pad_onf_params(params, config)
    padded = {k: v[None] for k, v in padded.items()}
    order = ["enc_w", "enc_b", "w1a", "w1b", "b1", "w2", "b2",
             "w3h", "w3a", "w3b", "b3", "angle_b"]

    out_shapes = {
        "loss": (8, 128),
        "d_enc_w": (8, fourier_p),
        "d_enc_b": (8, fourier_p),
        "d_w1a": (fourier_p, hidden_p),
        "d_w1b": (128, hidden_p),
        "d_b1": (8, hidden_p),
        "d_w2": (hidden_p, hidden_p),
        "d_b2": (8, hidden_p),
        "d_w3h": (hidden_p, 128),
        "d_w3a": (fourier_p, 128),
        "d_w3b": (128, 128),
        "d_b3": (8, 128),
        "d_angle_b": (8, 128),
    }
    out_order = list(out_shapes)

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda: (0,) * (len(shape) + 1), memory_space=pltpu.VMEM
        )

    kernel = functools.partial(_kernel, config=config, valid_rows=m)
    outs = pl.pallas_call(
        kernel,
        in_specs=[spec((m_pad, 128)), spec((m_pad, 128))]
        + [spec(padded[k].shape[1:]) for k in order],
        out_specs=tuple(spec(out_shapes[k]) for k in out_order),
        out_shape=tuple(
            jax.ShapeDtypeStruct((1,) + out_shapes[k], jnp.float32) for k in out_order
        ),
        interpret=interpret,
    )(x_padded, y_padded, *[padded[k] for k in order])
    res = {k: v[0] for k, v in zip(out_order, outs)}

    loss = res["loss"][0, 0]
    grads = {
        "encoding": {
            "w": res["d_enc_w"][:2, :fourier],
            # bias=False => non-trainable bias (ref nn.Linear(bias=False));
            # zero the grad so the zero leaf never drifts
            "b": res["d_enc_b"][0, :fourier] if config.bias
            else jnp.zeros((fourier,), res["d_enc_b"].dtype),
        },
        "mlp1": {
            "w": jnp.concatenate(
                [res["d_w1a"][:fourier, :hidden], res["d_w1b"][: feat - fourier, :hidden]],
                axis=0,
            ),
            "b": res["d_b1"][0, :hidden],
        },
        "mlp2": {"w": res["d_w2"][:hidden, :hidden], "b": res["d_b2"][0, :hidden]},
        "out": {
            "w": jnp.concatenate(
                [
                    res["d_w3h"][:hidden, :1],
                    res["d_w3a"][:fourier, :1],
                    res["d_w3b"][: feat - fourier, :1],
                ],
                axis=0,
            ),
            "b": res["d_b3"][0, :1],
        },
    }
    if config.angle_encoding:
        grads["angle_biases"] = res["d_angle_b"][0, : 2 * config.angle_harmonics]
    return loss, grads
