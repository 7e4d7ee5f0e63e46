"""Multi-problem fused field-training kernel: P problems per program.

Same math as field_grad.py (forward + BCE loss + ALL parameter gradients in
one VMEM-resident pass) but each Pallas program processes P problems in an
unrolled loop, amortizing per-program pipeline latency — the reason the
one-problem-per-program kernels lose to XLA at this workload's sizes
(BASELINE_MEASURED.md). Operates batch-explicitly: inputs/outputs carry the
batch axis, no vmap involved.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models.onf import ONFConfig
from .onf_fused import _round_up, pad_onf_params

__all__ = ["field_loss_and_grad_multi"]

_ORDER = [
    "enc_w", "enc_b", "w1a", "w1b", "b1", "w2", "b2",
    "w3h", "w3a", "w3b", "b3", "angle_b",
]
_OUTS = [
    "loss", "d_enc_w", "d_enc_b", "d_w1a", "d_w1b", "d_b1", "d_w2", "d_b2",
    "d_w3h", "d_w3a", "d_w3b", "d_b3", "d_angle_b",
]


def _kernel(x_ref, y_ref, *refs, config: ONFConfig, problems: int,
            valid_rows: int, compute):
    param_refs = refs[: len(_ORDER)]
    out_refs = dict(zip(_OUTS, refs[len(_ORDER):]))
    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics

    for p in range(problems):
        x = x_ref[p]
        y = y_ref[p]
        m = x.shape[0]
        (enc_w, enc_b, w1a, w1b, b1, w2, b2, w3h, w3a, w3b, b3, angle_b) = (
            r[p] for r in param_refs
        )
        row = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 0)
        col128 = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)

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
            freq = (col128 % harmonics + 1).astype(jnp.float32)
            phase = (theta + angle_b[0:1, :]) * freq
            angle = jnp.where(col128 < harmonics, jnp.sin(phase), jnp.cos(phase))
            angle = jnp.where(col128 < 2 * harmonics, angle, 0.0)
        else:
            freq = jnp.zeros((m, 128), jnp.float32)
            phase = jnp.zeros((m, 128), jnp.float32)
            angle = jnp.zeros((m, 128), jnp.float32)

        def mm(a, b):
            return jnp.dot(a.astype(compute), b.astype(compute),
                           preferred_element_type=jnp.float32)

        def mm_tb(a, b):
            return jax.lax.dot_general(
                a.astype(compute), b.astype(compute),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

        def mm_ta(a, b):
            return jax.lax.dot_general(
                a.astype(compute), b.astype(compute),
                (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        pre1 = mm(feats, w1a) + mm(angle, w1b) + b1[0:1, :]
        h1 = jnp.maximum(pre1, 0.0)
        pre2 = mm(h1, w2) + b2[0:1, :]
        h2 = jnp.maximum(pre2, 0.0)
        logits = mm(h2, w3h) + mm(feats, w3a) + mm(angle, w3b) + b3[0:1, :]

        active = (row < valid_rows) & (col128 == 0)
        z = logits
        bce = jnp.maximum(z, 0.0) - z * y + jnp.log1p(jnp.exp(-jnp.abs(z)))
        inv_n = 1.0 / float(valid_rows)
        loss = jnp.sum(jnp.where(active, bce, 0.0)) * inv_n
        orow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        ocol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        out_refs["loss"][p] = jnp.where((orow == 0) & (ocol == 0), loss, 0.0)

        g = jnp.where(active, (jax.nn.sigmoid(z) - y) * inv_n, 0.0)

        out_refs["d_w3h"][p] = mm_ta(h2, g)
        out_refs["d_w3a"][p] = mm_ta(feats, g)
        out_refs["d_w3b"][p] = mm_ta(angle, g)
        gsum = jnp.sum(g, axis=0, keepdims=True)
        zeros7 = jnp.zeros((7, 128), jnp.float32)
        out_refs["d_b3"][p] = jnp.concatenate([gsum, zeros7], axis=0)

        dh2 = jnp.where(pre2 > 0.0, mm_tb(g, w3h), 0.0)
        out_refs["d_w2"][p] = mm_ta(h1, dh2)
        d2sum = jnp.sum(dh2, axis=0, keepdims=True)
        out_refs["d_b2"][p] = jnp.concatenate(
            [d2sum, jnp.zeros((7,) + d2sum.shape[1:], jnp.float32)], axis=0)

        dh1 = jnp.where(pre1 > 0.0, mm_tb(dh2, w2), 0.0)
        out_refs["d_w1a"][p] = mm_ta(feats, dh1)
        out_refs["d_w1b"][p] = mm_ta(angle, dh1)
        d1sum = jnp.sum(dh1, axis=0, keepdims=True)
        out_refs["d_b1"][p] = jnp.concatenate(
            [d1sum, jnp.zeros((7,) + d1sum.shape[1:], jnp.float32)], axis=0)

        dfeats = mm_tb(g, w3a) + mm_tb(dh1, w1a)
        if config.use_cos:
            denc = jnp.where(colf < half, jnp.cos(enc), -jnp.sin(enc)) * dfeats
        else:
            denc = jnp.cos(enc) * dfeats
        denc = jnp.where(colf < fourier, denc, 0.0)
        dw0 = jnp.sum(xn * denc, axis=0, keepdims=True)
        dw1 = jnp.sum(yn * denc, axis=0, keepdims=True)
        dbe = jnp.sum(denc, axis=0, keepdims=True)
        zeros6 = jnp.zeros((6,) + dw0.shape[1:], jnp.float32)
        out_refs["d_enc_w"][p] = jnp.concatenate([dw0, dw1, zeros6], axis=0)
        out_refs["d_enc_b"][p] = jnp.concatenate(
            [dbe, jnp.zeros((7,) + dbe.shape[1:], jnp.float32)], axis=0)

        if config.angle_encoding:
            dangle = mm_tb(g, w3b) + mm_tb(dh1, w1b)
            dphase = jnp.where(col128 < harmonics, jnp.cos(phase), -jnp.sin(phase)) * dangle
            dphase = jnp.where(col128 < 2 * harmonics, dphase, 0.0)
            dab = jnp.sum(dphase * freq, axis=0, keepdims=True)
        else:
            dab = jnp.zeros((1, 128), jnp.float32)
        out_refs["d_angle_b"][p] = jnp.concatenate([dab, zeros7], axis=0)


def field_loss_and_grad_multi(
    config: ONFConfig,
    params: dict,  # batched [B, ...]
    points: jnp.ndarray,  # [B, M, 2|3]
    truth: jnp.ndarray,  # [B, M]
    problems_per_program: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Batch-explicit (loss [B], param-grad pytree batched [B, ...])."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    fourier = config.fourier_features
    feat = config.feature_dim
    hidden = config.hidden
    fourier_p = _round_up(fourier, 128)
    hidden_p = _round_up(hidden, 128)

    batch, m, dim = points.shape
    p = problems_per_program
    if batch % p != 0:
        raise ValueError(f"batch {batch} not divisible by {p}")
    m_pad = _round_up(m, 8)
    x_padded = jnp.zeros((batch, m_pad, 128), jnp.float32)
    x_padded = x_padded.at[:, :m, :dim].set(points)
    y_padded = jnp.zeros((batch, m_pad, 128), jnp.float32)
    y_padded = y_padded.at[:, :m, 0].set(truth.astype(jnp.float32))

    padded = jax.vmap(lambda q: pad_onf_params(q, config))(params)
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
    compute = jnp.dtype(config.compute_dtype)
    kernel = functools.partial(
        _kernel, config=config, problems=p, valid_rows=m, compute=compute
    )

    def spec(shape):
        return pl.BlockSpec(
            (p,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    outs = pl.pallas_call(
        kernel,
        grid=(batch // p,),
        in_specs=[spec((m_pad, 128)), spec((m_pad, 128))]
        + [spec(padded[k].shape[1:]) for k in _ORDER],
        out_specs=tuple(spec(out_shapes[k]) for k in _OUTS),
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch,) + out_shapes[k], jnp.float32)
            for k in _OUTS
        ),
        interpret=interpret,
    )(x_padded, y_padded, *[padded[k] for k in _ORDER])
    res = dict(zip(_OUTS, outs))

    loss = res["loss"][:, 0, 0]
    grads = {
        "encoding": {
            "w": res["d_enc_w"][:, :2, :fourier],
            # bias=False => non-trainable bias; zero the grad (see field_grad.py)
            "b": res["d_enc_b"][:, 0, :fourier] if config.bias
            else jnp.zeros_like(res["d_enc_b"][:, 0, :fourier]),
        },
        "mlp1": {
            "w": jnp.concatenate(
                [res["d_w1a"][:, :fourier, :hidden],
                 res["d_w1b"][:, : feat - fourier, :hidden]], axis=1),
            "b": res["d_b1"][:, 0, :hidden],
        },
        "mlp2": {"w": res["d_w2"][:, :hidden, :hidden], "b": res["d_b2"][:, 0, :hidden]},
        "out": {
            "w": jnp.concatenate(
                [res["d_w3h"][:, :hidden, :1],
                 res["d_w3a"][:, :fourier, :1],
                 res["d_w3b"][:, : feat - fourier, :1]], axis=1),
            "b": res["d_b3"][:, 0, :1],
        },
    }
    if config.angle_encoding:
        grads["angle_biases"] = res["d_angle_b"][:, 0, : 2 * config.angle_harmonics]
    return loss, grads
