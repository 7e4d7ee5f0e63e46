"""Tests mirroring the reference's test/test_benchmark_addpater.py against the
array-backed BenchmarkAdapter: concrete collision answers, bounds, start/goal,
path evaluation, result saving."""
import numpy as np
import pytest

from nfopp_tpu.bench import BenchmarkAdapter, BenchmarkCollisionChecker, ResultsLog
from nfopp_tpu.utils import Position2
from nfopp_tpu.worlds import GridScenario


@pytest.fixture(scope="module")
def adapter(tmp_path_factory):
    blocked = np.zeros((20, 20), bool)
    blocked[8:12, 8:12] = True  # central block, world [8,12)^2
    scenario = GridScenario(
        blocked=blocked, resolution=1.0,
        start=np.array([2.5, 2.5, 0.0], np.float32),
        goal=np.array([17.5, 17.5, 0.0], np.float32),
    )
    log = tmp_path_factory.mktemp("results") / "res.json"
    return BenchmarkAdapter(scenario, footprint_radius=0.0, log_file=log)


def test_endpoints_and_bounds(adapter):
    assert adapter.bounds() == (0.0, 20.0, 0.0, 20.0)
    np.testing.assert_allclose(adapter.start().as_vec(), [2.5, 2.5, 0.0])
    np.testing.assert_allclose(adapter.goal().as_vec(), [17.5, 17.5, 0.0])


def test_concrete_collision_answers(adapter):
    assert adapter.is_collision(Position2(10.0, 10.0, 0.3))
    assert not adapter.is_collision(Position2(2.0, 2.0, 0.0))
    assert adapter.is_collision(Position2(-1.0, 5.0, 0.0))  # out of bounds
    got = adapter.collides_positions(
        np.array([[10, 10, 0], [1, 1, 0], [11.5, 8.5, 1.0]], np.float32)
    )
    np.testing.assert_array_equal(got, [True, False, True])


def test_collision_checker_facade(adapter):
    checker = BenchmarkCollisionChecker(adapter)
    out = checker.check_collision(np.array([[10, 10, 0], [1, 1, 0]], np.float32))
    np.testing.assert_array_equal(out, [True, False])
    assert checker.get_boundaries() == (0.0, 20.0, 0.0, 20.0)


def test_evaluate_path(adapter):
    free = np.stack(
        [np.linspace(2.5, 17.5, 30), np.full(30, 2.0), np.zeros(30)], axis=1
    )
    collides, length = adapter.evaluate_path(free)
    assert not collides
    np.testing.assert_allclose(length, 15.0, atol=1e-5)

    through = np.stack(
        [np.linspace(2.5, 17.5, 30), np.linspace(2.5, 17.5, 30), np.zeros(30)], axis=1
    )
    collides, _ = adapter.evaluate_path(through)
    assert collides  # diagonal crosses the central block


def test_evaluate_and_save_results(adapter):
    path = np.stack(
        [np.linspace(2.5, 17.5, 30), np.full(30, 2.0), np.zeros(30)], axis=1
    )
    out = adapter.evaluate_and_save_results(path, "constrained_onf_planner")
    doc = ResultsLog.load(out)
    plan = doc["runs"][-1]["plans"]["constrained_onf_planner"]
    assert plan["stats"]["path_found"] is True
    assert plan["stats"]["path_collides"] is False
    assert plan["stats"]["path_length"] == pytest.approx(15.0, abs=1e-4)
    assert len(plan["trajectory"]) == 30
