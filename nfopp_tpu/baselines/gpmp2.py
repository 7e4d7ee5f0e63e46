"""GPMP2-style baseline planner in JAX — batched Gauss-Newton on TPU.

The reference compares NFOPP against GPMP2 via gtsam/gpmp2 Python bindings
(scripts/run_gpmp2.py: planar point robot, constant-velocity GP prior with
Qc = I, planar SDF obstacle factors with cost_sigma = 0.1 and epsilon = 1,
A*-initialized 100-step trajectory, Dogleg optimization). Those native
libraries are external; this module re-implements the same factor-graph
least-squares problem directly in JAX:

  state      X[i] = (x, y, vx, vy), i = 0..N-1; endpoints softly pinned
  GP prior   r_i = S^{-1/2} (Phi X_i - X_{i+1}),  Phi = const-velocity
             transition over dt, S = the standard white-noise-on-acceleration
             covariance [[dt^3/3, dt^2/2], [dt^2/2, dt]] (x) Qc
  obstacle   r_i = hinge(eps - sdf(p_i)) / cost_sigma   (+ interpolated points)

and minimizes 1/2 ||r(X)||^2 with damped Gauss-Newton (jacfwd + normal-equation
solve — the problem is only ~400 variables, so a dense solve on the MXU beats
sparse machinery). Everything is jittable and vmaps over problem batches: the
reference's single-problem CPU comparison becomes thousands of simultaneous
GPMP2 solves on one chip.

The SDF comes from a host-side euclidean distance transform of the occupancy
grid (scipy.ndimage), sampled on device with bilinear interpolation — matching
gpmp2's signedDistanceField2D + PlanarSDF pairing.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SDF", "build_sdf", "GPMP2Config", "gpmp2_plan", "gpmp2_cost"]


class SDF(NamedTuple):
    values: jnp.ndarray  # [H, W] signed distance (positive = free)
    origin: jnp.ndarray  # [2] world (x, y) of grid corner
    resolution: jnp.ndarray  # scalar


def build_sdf(blocked: np.ndarray, resolution: float, origin=(0.0, 0.0)) -> SDF:
    """Signed distance field from an occupancy grid (gpmp2
    signedDistanceField2D semantics: outside-distance − inside-distance)."""
    import scipy.ndimage as ndi

    blocked = np.asarray(blocked, bool)
    outside = ndi.distance_transform_edt(~blocked) * resolution
    inside = ndi.distance_transform_edt(blocked) * resolution
    signed = (outside - inside).astype(np.float32)
    return SDF(
        values=jnp.asarray(signed),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.float32(resolution),
    )


def sdf_lookup(sdf: SDF, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear SDF sample at [M, 2] world points -> [M]."""
    h, w = sdf.values.shape
    u = (xy[:, 0] - sdf.origin[0]) / sdf.resolution - 0.5  # col coordinate
    v = (xy[:, 1] - sdf.origin[1]) / sdf.resolution - 0.5  # row coordinate
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    g = sdf.values
    top = g[v0, u0] * (1 - du) + g[v0, u0 + 1] * du
    bottom = g[v0 + 1, u0] * (1 - du) + g[v0 + 1, u0 + 1] * du
    return top * (1 - dv) + bottom * dv


class GPMP2Config(NamedTuple):
    num_steps: int = 100  # trajectory states N
    total_time: float = 10.0  # seconds (ref run_gpmp2.py:93)
    qc: float = 1.0  # GP power-spectral density (Qc = qc * I)
    cost_sigma: float = 0.1  # obstacle factor sigma (ref :108)
    epsilon: float = 1.0  # obstacle clearance threshold (ref :109)
    fix_sigma: float = 1e-4  # endpoint prior sigma (ref :112-113)
    interpolation: int = 3  # GP-interpolated obstacle checks per segment
    iterations: int = 30  # damped Gauss-Newton iterations
    damping: float = 1e-3


def _gp_whitener(dt: float, qc: float) -> np.ndarray:
    """Inverse square root of the const-velocity transition covariance (per
    axis): S = qc * [[dt^3/3, dt^2/2], [dt^2/2, dt]]."""
    s = qc * np.array([[dt**3 / 3.0, dt**2 / 2.0], [dt**2 / 2.0, dt]])
    return np.linalg.cholesky(np.linalg.inv(s)).T.astype(np.float32)


def _residuals(flat_x, start, goal, sdf, config: GPMP2Config, whitener):
    n = config.num_steps
    dt = config.total_time / (n - 1)
    states = flat_x.reshape(n, 4)

    # GP prior residuals, whitened per axis: [N-1, 2, 2] -> flat
    pos, vel = states[:, :2], states[:, 2:]
    pred_pos = pos[:-1] + vel[:-1] * dt
    pred_vel = vel[:-1]
    err = jnp.stack([pred_pos - pos[1:], pred_vel - vel[1:]], axis=1)  # [N-1, 2(pos/vel), 2(xy)]
    gp_res = jnp.einsum("ab,nbd->nad", whitener, err).reshape(-1)

    # obstacle residuals at states + GP-interpolated points
    taus = jnp.linspace(0.0, 1.0, config.interpolation + 2)[1:-1]
    interp = pos[:-1, None, :] + (
        vel[:-1, None, :] * dt * taus[None, :, None]
    )  # const-velocity interpolation
    query = jnp.concatenate([pos, interp.reshape(-1, 2)], axis=0)
    dist = sdf_lookup(sdf, query)
    obstacle_res = jnp.maximum(config.epsilon - dist, 0.0) / config.cost_sigma

    # endpoint priors (conf + vel), ref pose_fix/vel_fix sigma 1e-4
    fix = jnp.concatenate(
        [states[0] - start, states[-1] - goal]
    ) / config.fix_sigma

    return jnp.concatenate([gp_res, obstacle_res, fix])


def gpmp2_cost(flat_x, start, goal, sdf, config: GPMP2Config, whitener):
    r = _residuals(flat_x, start, goal, sdf, config, whitener)
    return 0.5 * jnp.sum(r * r)


def gpmp2_plan(
    sdf: SDF,
    start_xy: jnp.ndarray,
    goal_xy: jnp.ndarray,
    config: GPMP2Config = GPMP2Config(),
    init_xy: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Solve one GPMP2 problem -> [N, 4] states. vmap over batches.

    init_xy [N, 2] optionally seeds the positions (e.g. a wavefront path);
    default straight line. Velocities init to the segment average.
    """
    n = config.num_steps
    dt = config.total_time / (n - 1)
    if init_xy is None:
        t = jnp.linspace(0.0, 1.0, n)[:, None]
        init_xy = start_xy[None] * (1 - t) + goal_xy[None] * t
    vel = jnp.gradient(init_xy, axis=0) / dt
    states = jnp.concatenate([init_xy, vel], axis=1)
    flat = states.reshape(-1)

    start = jnp.concatenate([start_xy, (init_xy[1] - init_xy[0]) / dt * 0.0])
    goal = jnp.concatenate([goal_xy, jnp.zeros(2)])
    whitener = jnp.asarray(_gp_whitener(dt, config.qc))

    res_fn = lambda x: _residuals(x, start, goal, sdf, config, whitener)

    def gn_step(flat, _):
        r = res_fn(flat)
        jac = jax.jacfwd(res_fn)(flat)  # [M, 4N]
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damped = jtj + config.damping * jnp.diag(jnp.diag(jtj))
        delta = jnp.linalg.solve(
            damped + 1e-8 * jnp.eye(jtj.shape[0]), jtr
        )
        new_flat = flat - delta
        # accept only if the cost decreases (poor-man's dogleg trust region)
        better = jnp.sum(res_fn(new_flat) ** 2) < jnp.sum(r * r)
        return jnp.where(better, new_flat, flat), None

    flat, _ = jax.lax.scan(gn_step, flat, None, length=config.iterations)
    return flat.reshape(n, 4)
