"""Tests for the JAX GPMP2 baseline."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.baselines import GPMP2Config, build_sdf, gpmp2_plan
from nfopp_tpu.baselines.gpmp2 import sdf_lookup


def test_sdf_signs_and_distances():
    blocked = np.zeros((20, 20), bool)
    blocked[8:12, 8:12] = True
    sdf = build_sdf(blocked, resolution=1.0)
    # free cell far from the block: positive, roughly the euclidean distance
    q = jnp.asarray([[2.5, 2.5], [9.5, 9.5], [12.9, 9.5]], jnp.float32)
    d = np.asarray(sdf_lookup(sdf, q))
    assert d[0] > 5.0
    assert d[1] < 0.0  # inside the block
    assert 0.0 < d[2] < 2.5


def test_straight_corridor_plan_stays_clear():
    # Block offset from the start-goal line: a centered block is a symmetric
    # saddle for gradient methods (the reference breaks it with A* init).
    blocked = np.zeros((30, 30), bool)
    blocked[13:19, 10:20] = True
    sdf = build_sdf(blocked, resolution=1.0)
    config = GPMP2Config(num_steps=50, epsilon=2.0, iterations=40)
    path = gpmp2_plan(
        sdf, jnp.asarray([5.0, 15.0]), jnp.asarray([25.0, 15.0]), config
    )
    xy = np.asarray(path[:, :2])
    # endpoints pinned
    np.testing.assert_allclose(xy[0], [5, 15], atol=0.1)
    np.testing.assert_allclose(xy[-1], [25, 15], atol=0.1)
    # path bends around the block: clearance respected at every waypoint
    d = np.asarray(sdf_lookup(sdf, jnp.asarray(xy, jnp.float32)))
    assert (d > 0.5).all(), f"min clearance {d.min():.2f}"
    assert xy[:, 1].min() < 13.0  # actually detoured


def test_batched_plans():
    blocked = np.zeros((2, 16, 16), bool)
    blocked[0, 7:11, 6:10] = True  # center y=9, off the y=8 line
    sdfs = [build_sdf(blocked[i], 1.0) for i in range(2)]
    sdf_batch = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *sdfs)
    starts = jnp.asarray([[2.0, 8.0], [2.0, 2.0]])
    goals = jnp.asarray([[14.0, 8.0], [14.0, 14.0]])
    config = GPMP2Config(num_steps=30, iterations=20, epsilon=1.5)
    plan = jax.jit(jax.vmap(lambda s, a, b: gpmp2_plan(s, a, b, config)))
    out = np.asarray(plan(sdf_batch, starts, goals))
    assert out.shape == (2, 30, 4)
    assert np.isfinite(out).all()
    # problem 0 must detour below the block
    assert out[0, :, 1].min() < 6.5
