"""run_grid_suite: tracked suite solves, full-budget mode, restart fallback.

The suite runner is the batched counterpart of the reference's
scripts/run_bench_mr.py loop (:111-134); these tests pin its control-flow
semantics on tiny grid worlds (CPU, virtual 8-device mesh via conftest).
"""
import jax
import numpy as np
import pytest

from nfopp_tpu.bench.runner import run_grid_suite
from nfopp_tpu.parallel import problem_mesh
from nfopp_tpu.utils import AttributeDict
from nfopp_tpu.worlds.scenarios import GridScenario


def small_parameters():
    """Tiny solver configuration so CPU compiles/solves stay fast."""
    return AttributeDict(
        trajectory_length=24,
        collision_model=AttributeDict(
            mean=0.0, sigma=2.0, use_cos=True, bias=True, use_normal_init=True,
            angle_encoding=True, name="ONF",
        ),
        collision_optimizer=AttributeDict(lr=2e-2, betas=(0.9, 0.9)),
        trajectory_optimizer=AttributeDict(lr=5e-2, betas=(0.9, 0.9)),
        planner=AttributeDict(
            name="ConstrainedNFOPPlanner",
            trajectory_random_offset=0.02, collision_weight=100.0,
            velocity_hessian_weight=0.5, random_field_points=10,
            init_collision_iteration=20, constraint_deltas_weight=100.0,
            multipliers_lr=0.1, init_collision_points=64,
            reparametrize_trajectory_freq=10, optimize_collision_model_freq=1,
            angle_weight=5.0, angle_offset=0.3, boundary_weight=1.0,
            direction_delta_weight=100.0, collision_multipliers_lr=1e-3,
            collision_beta=10.0, course_random_offset=1.5,
        ),
    )


def wall_scenario() -> GridScenario:
    """16x16 world, one wall with a gap; solvable at a small budget."""
    blocked = np.zeros((16, 16), bool)
    blocked[3:13, 8] = True
    blocked[7:9, 8] = False  # gap
    return GridScenario(
        blocked, resolution=1.0,
        start=np.array([3.5, 8.5, 0.0], np.float32),
        goal=np.array([13.5, 8.5, 0.0], np.float32),
    )


def boxed_scenario() -> GridScenario:
    """Start sealed inside a box: infeasible by construction (the wavefront
    init degenerates; no budget or restart can solve it)."""
    blocked = np.zeros((16, 16), bool)
    blocked[2:7, 2:7] = True
    blocked[3:6, 3:6] = False  # hollow box, no opening
    return GridScenario(
        blocked, resolution=1.0,
        start=np.array([4.5, 4.5, 0.0], np.float32),
        goal=np.array([13.5, 13.5, 0.0], np.float32),
    )


@pytest.fixture(scope="module")
def mesh2():
    # batch sizes here (2) don't divide the 8-device test mesh; use 2 devices
    return problem_mesh(jax.devices()[:2])


@pytest.fixture(scope="module")
def suite_result(mesh2):
    scenarios = [wall_scenario(), wall_scenario()]
    return scenarios, run_grid_suite(
        scenarios, small_parameters(), max_iterations=200,
        min_iterations=50, check_freq=25, mesh=mesh2,
    )


class TestRunGridSuite:
    def test_shapes_and_feasibility(self, suite_result):
        scenarios, result = suite_result
        assert result.paths.shape == (2, 26, 3)
        assert result.feasible.all()
        assert (result.iterations > 0).all()
        assert len(result.stats) == 2
        # endpoints pinned
        np.testing.assert_allclose(result.paths[0, 0], scenarios[0].start, atol=1e-5)
        np.testing.assert_allclose(result.paths[0, -1], scenarios[0].goal, atol=1e-5)

    def test_results_log_schema(self, suite_result):
        _, result = suite_result
        assert len(result.log.runs) == 2
        stats = result.log.runs[0]["plans"]["constrained_onf_planner"]["stats"]
        assert stats["path_found"] is True

    def test_full_budget_no_worse(self, suite_result):
        """Same RNG: the full-budget best-tracked path cannot be longer than
        the plateau-stop return (its checks are a superset)."""
        scenarios, plateau = suite_result
        full = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, stop_on_plateau=False,
            mesh=problem_mesh(jax.devices()[:2]),
        )
        assert full.feasible.all()
        assert (full.iterations == 200).all()
        assert (full.lengths <= plateau.lengths + 1e-5).all()


class TestRestartFailed:
    def test_infeasible_problem_restarts_do_not_crash(self):
        """1 failed problem x 3 restarts on a 2-device mesh exercises the
        shard-padding path (3 -> padded to 4); a sealed start stays
        infeasible."""
        scenarios = [wall_scenario(), boxed_scenario()]
        result = run_grid_suite(
            scenarios, small_parameters(), max_iterations=100,
            min_iterations=50, check_freq=25, restart_failed=3,
            mesh=problem_mesh(jax.devices()[:2]),
        )
        assert bool(result.feasible[0])
        assert not bool(result.feasible[1])

    def test_multi_round_restarts_stop_at_budget(self):
        """restart_rounds > 1 on an unsolvable problem: every round runs (the
        sealed box can never become feasible), rounds_used is recorded, and
        the feasible problem is untouched."""
        scenarios = [wall_scenario(), boxed_scenario()]
        result = run_grid_suite(
            scenarios, small_parameters(), max_iterations=100,
            min_iterations=50, check_freq=25, restart_failed=2,
            restart_rounds=2, mesh=problem_mesh(jax.devices()[:2]),
        )
        assert bool(result.feasible[0])
        assert not bool(result.feasible[1])
        assert result.restart_rounds_used == 2
        assert result.log.settings["suite"]["restart_rounds_used"] == 2

    def test_rounds_used_zero_when_all_feasible(self):
        scenarios = [wall_scenario(), wall_scenario()]
        result = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, restart_failed=4,
            restart_rounds=3, mesh=problem_mesh(jax.devices()[:2]),
        )
        assert result.feasible.all()
        assert result.restart_rounds_used == 0

    def test_restart_noop_when_all_feasible(self):
        """When the base solve already succeeds, restart_failed must change
        nothing (the recovery path itself is covered by the measured forest
        seed-6 probe, BASELINE_MEASURED.md — engineering a deterministic
        fail-then-recover fixture at a tiny budget is flaky)."""
        scenarios = [wall_scenario()]
        mesh1 = problem_mesh(jax.devices()[:1])
        base = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, mesh=mesh1,
        )
        with_restart = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, restart_failed=4, mesh=mesh1,
        )
        assert bool(base.feasible[0]) and bool(with_restart.feasible[0])
        np.testing.assert_allclose(base.paths, with_restart.paths)
        np.testing.assert_array_equal(base.iterations, with_restart.iterations)


class TestShortcutTrials:
    def test_shortcut_shortens_without_breaking(self, suite_result, mesh2):
        """shortcut_trials > 0: feasibility and endpoints unchanged, lengths
        never longer, infeasible problems untouched."""
        scenarios, base = suite_result
        short = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, mesh=mesh2,
            shortcut_trials=32,
        )
        assert short.feasible.all()
        assert (short.lengths <= base.lengths + 1e-5).all()
        np.testing.assert_allclose(short.paths[:, 0], base.paths[:, 0], atol=1e-5)
        np.testing.assert_allclose(short.paths[:, -1], base.paths[:, -1], atol=1e-5)
        # logged stats reflect the shortcut paths
        stats = short.log.runs[0]["plans"]["constrained_onf_planner"]["stats"]
        assert abs(stats["path_length"] - float(short.lengths[0])) < 1e-3

    def test_repair_and_evaluator_provenance_recorded(self, suite_result, mesh2):
        """Suite artifacts must say which evaluator produced the stats and how
        many problems the shortcut pass rescued (ADVICE r3: feasibility parity
        claims stay attributable)."""
        scenarios, _ = suite_result
        short = run_grid_suite(
            scenarios, small_parameters(), max_iterations=200,
            min_iterations=50, check_freq=25, mesh=mesh2, shortcut_trials=8,
        )
        assert short.log.settings["evaluator"] in ("native", "numpy")
        suite = short.log.settings["suite"]
        assert suite["shortcut_trials"] == 8
        # both wall problems solve outright, so nothing was chord-repaired
        assert suite["repaired_by_shortcut"] == short.repaired_by_shortcut == 0

    def test_shortcut_noop_on_infeasible(self):
        scenarios = [wall_scenario(), boxed_scenario()]
        mesh = problem_mesh(jax.devices()[:2])
        base = run_grid_suite(
            scenarios, small_parameters(), max_iterations=100,
            min_iterations=50, check_freq=25, mesh=mesh,
        )
        short = run_grid_suite(
            scenarios, small_parameters(), max_iterations=100,
            min_iterations=50, check_freq=25, mesh=mesh, shortcut_trials=32,
        )
        assert not bool(short.feasible[1])
        np.testing.assert_allclose(short.paths[1], base.paths[1])
