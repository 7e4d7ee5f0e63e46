"""Fused ONF forward kernel (Pallas/TPU).

One kernel evaluates the entire field MLP for one problem's point batch:
normalization -> Fourier encoding -> angle encoding -> two ReLU layers ->
skip-concat output head — all intermediates stay in VMEM, one HBM round trip
instead of ~10 XLA buffer materializations. Grid = problem batch; each program
processes one problem with its own parameters, matching the per-problem-field
batched regime.

Instead of concatenating feature blocks at lane-unaligned offsets (a relayout
on TPU), the weight matrices are SPLIT along the contraction dim at padding
time: skip-concat [h2 | fourier | angle] @ W3 becomes three aligned matmuls
summed — identical math, no data movement. Zero-padding weights/biases keeps
padded units exactly zero through ReLU, so results match `onf_apply` to f32
reassociation error.

Primarily used for large-M field evaluation (heatmaps, clearance fields,
dense path checks); at the training loop's M≈200 XLA's fused schedule is
already competitive (see bench notes).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...models.onf import ONFConfig

__all__ = ["onf_apply_fused", "pad_onf_params"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_onf_params(params: dict, config: ONFConfig) -> dict:
    """Zero-pad + split weights to lane-aligned blocks; plain f32 arrays."""
    fourier = config.fourier_features
    feat = config.feature_dim
    hidden = config.hidden
    fourier_p = _round_up(fourier, 128)
    hidden_p = _round_up(hidden, 128)

    def pad(a, shape):
        out = jnp.zeros(shape, jnp.float32)
        return out.at[tuple(slice(0, s) for s in a.shape)].set(a)

    w1 = params["mlp1"]["w"]
    w3 = params["out"]["w"]
    padded = {
        "enc_w": pad(params["encoding"]["w"], (8, fourier_p)),
        "enc_b": pad(params["encoding"]["b"][None], (8, fourier_p)),
        # mlp1 split: fourier rows | angle rows
        "w1a": pad(w1[:fourier], (fourier_p, hidden_p)),
        "w1b": pad(w1[fourier:feat], (128, hidden_p)),
        "b1": pad(params["mlp1"]["b"][None], (8, hidden_p)),
        "w2": pad(params["mlp2"]["w"], (hidden_p, hidden_p)),
        "b2": pad(params["mlp2"]["b"][None], (8, hidden_p)),
        # out split: hidden rows | fourier rows | angle rows
        "w3h": pad(w3[:hidden], (hidden_p, 128)),
        "w3a": pad(w3[hidden : hidden + fourier], (fourier_p, 128)),
        "w3b": pad(w3[hidden + fourier : hidden + feat], (128, 128)),
        "b3": pad(params["out"]["b"][None], (8, 128)),
    }
    if config.angle_encoding:
        padded["angle_b"] = pad(params["angle_biases"][None], (8, 128))
    else:
        padded["angle_b"] = jnp.zeros((8, 128), jnp.float32)
    return padded


def _onf_kernel(
    x_ref, enc_w, enc_b, w1a, w1b, b1, w2, b2, w3h, w3a, w3b, b3, angle_b,
    out_ref, *, config: ONFConfig
):
    fourier = config.fourier_features
    half = fourier // 2
    harmonics = config.angle_harmonics

    x = x_ref[0]  # [M, 128]; cols 0..2 hold (x, y, theta)
    m = x.shape[0]
    xn = (x[:, 0:1] - config.mean) / config.sigma
    yn = (x[:, 1:2] - config.mean) / config.sigma

    # drop each ref's leading block dim of 1
    ew, eb = enc_w[0], enc_b[0]
    w1a_v, w1b_v, b1_v = w1a[0], w1b[0], b1[0]
    w2_v, b2_v = w2[0], b2[0]
    w3h_v, w3a_v, w3b_v, b3_v = w3h[0], w3a[0], w3b[0], b3[0]

    # encoding layer (contraction dim 2): two rank-1 updates on the VPU
    enc = xn * ew[0:1, :] + yn * ew[1:2, :] + eb[0:1, :]
    col = jax.lax.broadcasted_iota(jnp.int32, enc.shape, 1)
    if config.use_cos:
        fourier_feats = jnp.where(col < half, jnp.sin(enc), jnp.cos(enc))
    else:
        fourier_feats = jnp.sin(enc)
    fourier_feats = jnp.where(col < fourier, fourier_feats, 0.0)

    if config.angle_encoding:
        ab = angle_b[0]
        theta = x[:, 2:3]
        acol = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
        freq = (acol % harmonics + 1).astype(jnp.float32)
        phase = (theta + ab[0:1, :]) * freq
        angle_feats = jnp.where(acol < harmonics, jnp.sin(phase), jnp.cos(phase))
        angle_feats = jnp.where(acol < 2 * harmonics, angle_feats, 0.0)
    else:
        angle_feats = jnp.zeros((m, 128), jnp.float32)

    pre1 = (
        jnp.dot(fourier_feats, w1a_v, preferred_element_type=jnp.float32)
        + jnp.dot(angle_feats, w1b_v, preferred_element_type=jnp.float32)
        + b1_v[0:1, :]
    )
    h1 = jnp.maximum(pre1, 0.0)
    h2 = jnp.maximum(
        jnp.dot(h1, w2_v, preferred_element_type=jnp.float32) + b2_v[0:1, :], 0.0
    )
    logits = (
        jnp.dot(h2, w3h_v, preferred_element_type=jnp.float32)
        + jnp.dot(fourier_feats, w3a_v, preferred_element_type=jnp.float32)
        + jnp.dot(angle_feats, w3b_v, preferred_element_type=jnp.float32)
        + b3_v[0:1, :]
    )
    out_ref[0] = logits[:, :1]


def onf_apply_fused_single(
    params: dict,
    x: jnp.ndarray,
    config: ONFConfig = ONFConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused forward for ONE problem: x [M, 2|3] -> [M, 1]. vmap for batches
    (the pallas_call batching rule turns the vmap axis into a kernel grid)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, dim = x.shape
    m_pad = _round_up(m, 8)
    x_padded = jnp.zeros((1, m_pad, 128), jnp.float32)
    x_padded = x_padded.at[0, :m, :dim].set(x)

    padded = {k: v[None] for k, v in pad_onf_params(params, config).items()}
    kernel = functools.partial(_onf_kernel, config=config)
    order = [
        "enc_w", "enc_b", "w1a", "w1b", "b1", "w2", "b2",
        "w3h", "w3a", "w3b", "b3", "angle_b",
    ]

    def spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    out = pl.pallas_call(
        kernel,
        in_specs=[spec(x_padded)] + [spec(padded[k]) for k in order],
        out_specs=spec(jnp.zeros((1, m_pad, 1))),
        out_shape=jax.ShapeDtypeStruct((1, m_pad, 1), jnp.float32),
        interpret=interpret,
    )(x_padded, *[padded[k] for k in order])
    return out[0, :m]


def onf_apply_fused(
    params: dict,
    x: jnp.ndarray,
    config: ONFConfig = ONFConfig(),
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused forward: params [B, ...] pytree, x [B, M, 3] -> [B, M, 1]."""
    return jax.vmap(
        lambda p, q: onf_apply_fused_single(p, q, config, interpret)
    )(params, x)
