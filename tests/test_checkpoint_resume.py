"""Elastic mid-solve checkpoint/resume (BatchPlanner.solve_checkpointed).

SURVEY.md §5: the reference has no checkpoint/resume at all. Here a tracked
benchmark solve serializes its TrackingCarry every K chunks; a killed run
resumed from the checkpoint re-executes the exact segment programs an
uninterrupted run would, so results are bit-identical.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nfopp_tpu.models import ONFConfig
from nfopp_tpu.parallel import BatchPlanner
from nfopp_tpu.solver import ConstrainedSolver, SolverConfig
from nfopp_tpu.worlds import (
    CircleOracle,
    circle_collision,
    pad_obstacle_points,
    two_walls_se2_environment,
)


def _setup(batch=8):
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
    planner = BatchPlanner(solver)
    starts = jnp.tile(jnp.asarray(env.start)[None], (batch, 1))
    goals = jnp.tile(jnp.asarray(env.goal)[None], (batch, 1))
    bounds = jnp.tile(jnp.asarray(env.bounds, jnp.float32)[None], (batch, 1))
    oracles = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), oracle
    )
    states = planner.init_batch(jax.random.PRNGKey(0), starts, goals, bounds, oracles)
    return planner, states, oracles


SOLVE_KW = dict(max_iterations=80, min_iterations=20, check_freq=10)


def _result_tuple(r):
    return (np.asarray(r.path), np.asarray(r.length), np.asarray(r.feasible),
            np.asarray(r.iterations))


def test_checkpointed_matches_plain_solve(tmp_path):
    planner, states, oracles = _setup()
    plain = planner.solve(states, oracles, stop_on_plateau=False, **SOLVE_KW)
    ckpt = planner.solve_checkpointed(
        states, oracles, tmp_path / "run.npz", stop_on_plateau=False,
        checkpoint_every_chunks=3, **SOLVE_KW,
    )
    # different XLA programs (segmented vs one while_loop) — tolerance, not bits
    np.testing.assert_allclose(
        np.asarray(ckpt.path), np.asarray(plain.path), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(ckpt.feasible), np.asarray(plain.feasible)
    )
    np.testing.assert_array_equal(
        np.asarray(ckpt.iterations), np.asarray(plain.iterations)
    )
    assert (tmp_path / "run.npz").exists()


def test_kill_and_resume_bit_identical(tmp_path, monkeypatch):
    planner, states, oracles = _setup()
    kw = dict(stop_on_plateau=False, checkpoint_every_chunks=2, **SOLVE_KW)

    full = planner.solve_checkpointed(
        states, oracles, tmp_path / "uninterrupted.npz", **kw
    )

    # simulated preemption: die right after the second checkpoint save
    import nfopp_tpu.solver.checkpoint as ckpt_mod

    real_save = ckpt_mod.save_state
    calls = {"n": 0}

    def dying_save(state, path):
        out = real_save(state, path)
        calls["n"] += 1
        if calls["n"] >= 2:
            raise KeyboardInterrupt("simulated preemption")
        return out

    monkeypatch.setattr(ckpt_mod, "save_state", dying_save)
    with pytest.raises(KeyboardInterrupt):
        planner.solve_checkpointed(states, oracles, tmp_path / "killed.npz", **kw)
    monkeypatch.setattr(ckpt_mod, "save_state", real_save)
    assert (tmp_path / "killed.npz").exists()

    resumed = planner.solve_checkpointed(
        states, oracles, tmp_path / "killed.npz", resume=True, **kw
    )
    for a, b in zip(_result_tuple(full), _result_tuple(resumed)):
        np.testing.assert_array_equal(a, b)


def test_resume_after_completion_is_noop_finalize(tmp_path):
    planner, states, oracles = _setup()
    kw = dict(stop_on_plateau=False, checkpoint_every_chunks=2, **SOLVE_KW)
    first = planner.solve_checkpointed(states, oracles, tmp_path / "c.npz", **kw)
    again = planner.solve_checkpointed(
        states, oracles, tmp_path / "c.npz", resume=True, **kw
    )
    for a, b in zip(_result_tuple(first), _result_tuple(again)):
        np.testing.assert_array_equal(a, b)


def test_suite_runner_checkpoint_and_resume(tmp_path):
    """run_grid_suite-level: checkpoint written; resumed run reproduces the
    uninterrupted suite (same RNG, same worlds)."""
    from nfopp_tpu.bench.runner import run_grid_suite
    from nfopp_tpu.worlds import corridor, resample_distant_endpoints

    scenarios = resample_distant_endpoints(
        [corridor(seed=s, size=40, branches=30, radius=3) for s in range(8)], 30.0
    )
    kw = dict(
        footprint_radius=1.0, max_iterations=60, min_iterations=20,
        check_freq=10, stop_on_plateau=False,
        checkpoint_path=tmp_path / "suite.npz", checkpoint_every_chunks=2,
    )
    r1 = run_grid_suite(scenarios, max_iterations=60, min_iterations=20,
                        check_freq=10, footprint_radius=1.0,
                        stop_on_plateau=False)
    r2 = run_grid_suite(scenarios, **kw)
    assert (tmp_path / "suite.npz").exists()
    np.testing.assert_allclose(r2.paths, r1.paths, atol=1e-5)
    # resume from the completed checkpoint: fast-forward, identical output
    r3 = run_grid_suite(scenarios, resume=True, **kw)
    np.testing.assert_array_equal(r3.paths, r2.paths)
    np.testing.assert_array_equal(r3.feasible, r2.feasible)
