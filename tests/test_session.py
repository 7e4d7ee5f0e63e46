"""Device-side scripted replanning session (service/session.py).

The session is the hardware-true latency probe: K replan cycles inside one
jitted program. These tests pin that one session cycle == the manual
update_start + run sequence the host service performs, that goal rounds
retarget correctly, and that the fleet variant keeps shared-field groups in
lockstep.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nfopp_tpu.service import fleet_replan_session, replan_session
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.models import ONFConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def _setup(batch: int = 0):
    env = two_walls_se2_environment()
    pts, mask = pad_obstacle_points(env.obstacle_points.astype(np.float32), 32)
    oracle = CircleOracle(
        jnp.asarray(pts), jnp.asarray(mask), jnp.float32(0.3),
        jnp.asarray([0.0, 3.0, 0.0, 3.0], jnp.float32),
    )
    cfg = SolverConfig(
        trajectory_length=12, collision_point_count=12, random_field_points=4,
        onf=ONFConfig(angle_encoding=True), angle_offset=0.3,
    )
    solver = ConstrainedSolver(cfg, circle_collision)
    if not batch:
        state = solver.init_state(
            jax.random.PRNGKey(0), jnp.asarray(env.start), jnp.asarray(env.goal),
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
        return env, solver, state, oracle
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    states = jax.vmap(
        lambda k: solver.init_state(
            k, jnp.asarray(env.start), jnp.asarray(env.goal),
            jnp.asarray(env.bounds, jnp.float32), oracle,
        )
    )(keys)
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    return env, solver, states, oracles


def test_one_cycle_matches_manual_sequence():
    env, solver, state, oracle = _setup()
    goals = jnp.asarray(env.goal, jnp.float32)[None]
    out, aux = jax.jit(
        lambda s, o, g: replan_session(solver, s, o, g, 1, 10)
    )(state, oracle, goals)

    # manual: retarget to the goal from path[3], then one cycle
    path = solver.full_trajectory(state)
    st = solver.retarget(state, path[3], jnp.asarray(env.goal, jnp.float32))
    pose = solver.full_trajectory(st)[3]
    st = solver.update_start(st, pose)
    st, _ = jax.jit(lambda s, o: solver.run(s, o, 10))(st, oracle)

    np.testing.assert_allclose(
        np.asarray(out.trajectory), np.asarray(st.trajectory), atol=1e-6
    )
    assert aux.path_length.shape == (1, 1)
    np.testing.assert_allclose(np.asarray(aux.pose[0, 0]), np.asarray(pose), atol=1e-6)


def test_session_tracks_pose_and_pins_goal():
    env, solver, state, oracle = _setup()
    goal = jnp.asarray(env.goal, jnp.float32)
    goals = jnp.stack([goal, jnp.asarray(env.start, jnp.float32)])
    out, aux = jax.jit(
        lambda s, o, g: replan_session(solver, s, o, g, 5, 10)
    )(state, oracle, goals)
    assert aux.path_length.shape == (2, 5)
    assert np.all(np.isfinite(np.asarray(aux.path_length)))
    # final goal row pinned to the last scripted goal
    final_path = np.asarray(solver.full_trajectory(out))
    np.testing.assert_allclose(final_path[-1], np.asarray(env.start), atol=1e-6)
    # poses move: the robot followed its plan between cycles
    poses = np.asarray(aux.pose).reshape(-1, 3)
    assert np.linalg.norm(poses[1:, :2] - poses[:-1, :2], axis=1).max() > 1e-4


def test_session_requires_chunk_aligned_steps():
    env, solver, state, oracle = _setup()
    with pytest.raises(ValueError, match="multiple"):
        replan_session(solver, state, oracle, jnp.zeros((1, 3)), 1, 7)


def test_fleet_session_lockstep_and_shapes():
    env, solver, states, oracles = _setup(batch=4)
    goal = jnp.asarray(env.goal, jnp.float32)
    start = jnp.asarray(env.start, jnp.float32)
    goals = jnp.stack([jnp.stack([goal, goal, start, start])])  # [1, 4, 3]
    out, aux = jax.jit(
        lambda s, o, g: fleet_replan_session(solver, s, o, g, 3, 10, group_size=4)
    )(states, oracles, goals)
    assert aux.path_length.shape == (1, 3, 4)
    # shared-field group: all four robots hold identical field params
    # only if they were initialized identically — here init used distinct
    # keys, so just require finiteness and per-robot goal pinning
    paths = np.asarray(jax.vmap(solver.full_trajectory)(out))
    np.testing.assert_allclose(paths[0, -1], np.asarray(goal), atol=1e-6)
    np.testing.assert_allclose(paths[2, -1], np.asarray(start), atol=1e-6)
    assert np.all(np.isfinite(paths))


def test_fleet_session_subgroups_bitequal_to_independent_sessions():
    """subgroups=S is a SCHEDULE, not a semantics change: sub-batches are
    independent (groups never span them), so a subgrouped fleet session
    matches running each sub-fleet as its own session. Equality is to float
    tolerance, not bit: XLA fuses the burst body differently inside the
    sub-batch scan than in the standalone program (same per-program-shape
    fusion drift as the cross-mesh note in __graft_entry__)."""
    env, solver, states, oracles = _setup(batch=8)
    goal = jnp.asarray(env.goal, jnp.float32)
    start = jnp.asarray(env.start, jnp.float32)
    row = jnp.stack([goal if i % 2 == 0 else start for i in range(8)])
    goals = jnp.stack([row, row[::-1]])  # [2, 8, 3]

    out, aux = jax.jit(
        lambda s, o, g: fleet_replan_session(
            solver, s, o, g, 2, 10, group_size=4, subgroups=2
        )
    )(states, oracles, goals)
    assert aux.path_length.shape == (2, 2, 8)

    half = lambda tree, sl: jax.tree_util.tree_map(lambda x: x[sl], tree)
    for s0, sl in ((0, slice(0, 4)), (1, slice(4, 8))):
        ref_out, ref_aux = jax.jit(
            lambda s, o, g: fleet_replan_session(
                solver, s, o, g, 2, 10, group_size=4
            )
        )(half(states, sl), half(oracles, sl), goals[:, sl])
        np.testing.assert_allclose(
            np.asarray(out.trajectory[sl]), np.asarray(ref_out.trajectory),
            atol=5e-3,
        )
        # the goal comes verbatim from the retarget row: exact across
        # schedules (start is the tracked pose — it inherits the drift)
        np.testing.assert_array_equal(
            np.asarray(out.goal[sl]), np.asarray(ref_out.goal)
        )
        np.testing.assert_allclose(
            np.asarray(out.start[sl]), np.asarray(ref_out.start), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(aux.path_length[:, :, sl]),
            np.asarray(ref_aux.path_length), rtol=1e-3,
        )


def test_fleet_session_subgroup_validation():
    env, solver, states, oracles = _setup(batch=8)
    goals = jnp.zeros((1, 8, 3), jnp.float32)
    with pytest.raises(ValueError, match="divisible by subgroups"):
        fleet_replan_session(
            solver, states, oracles, goals, 1, 10, group_size=1, subgroups=3
        )
    with pytest.raises(ValueError, match="span sequential sub-batches"):
        fleet_replan_session(
            solver, states, oracles, goals, 1, 10, group_size=4, subgroups=4
        )
