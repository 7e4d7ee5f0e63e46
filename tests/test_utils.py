"""Tests for config/factory/timer/host_math/Position2 utilities."""
import numpy as np
import pytest

from nfopp_tpu.utils import AttributeDict, Config, Position2, Timer, UniversalFactory
from nfopp_tpu.utils import host_math as hm


class TestConfig:
    def test_attribute_access(self):
        d = AttributeDict({"a": 1, "nested": {"b": 2}})
        assert d.a == 1
        assert d.nested.b == 2
        d.c = 3
        assert d["c"] == 3
        with pytest.raises(AttributeError):
            _ = d.missing

    def test_recursive_update(self):
        cfg = Config.from_dict({"planner": {"lr": 0.01, "n": 100}, "top": 1})
        cfg.update({"planner": {"lr": 0.5}, "extra": True})
        out = cfg.as_attribute_dict()
        assert out.planner.lr == 0.5
        assert out.planner.n == 100  # untouched sibling survives the merge
        assert out.top == 1 and out.extra is True


class TestFactory:
    def test_builds_by_name_with_signature_filtering(self):
        class Widget:
            def __init__(self, size, color="red"):
                self.size, self.color = size, color

        factory = UniversalFactory([Widget])
        w = factory.make_from_parameters({"name": "Widget", "size": 3, "junk": 9})
        assert (w.size, w.color) == (3, "red")

    def test_nested_construction_and_extra_kwargs(self):
        class Inner:
            def __init__(self, value):
                self.value = value

        class Outer:
            def __init__(self, inner, runtime):
                self.inner, self.runtime = inner, runtime

        factory = UniversalFactory([Inner, Outer])
        out = factory.make_from_parameters(
            {"name": "Outer", "inner": {"name": "Inner", "value": 5}}, runtime="R"
        )
        assert out.inner.value == 5 and out.runtime == "R"

    def test_unknown_name_raises(self):
        with pytest.raises(KeyError):
            UniversalFactory([]).make_from_parameters({"name": "Nope"})


def test_timer_collects_stats():
    t = Timer()
    for _ in range(3):
        t.tick("phase")
        t.tock("phase")
    mean_ms, std_ms, count = t.stats()["phase"]
    assert count == 3 and mean_ms >= 0


class TestHostMath:
    def test_unfold_roundtrip(self):
        raw = np.cumsum(np.random.RandomState(0).uniform(-0.3, 0.3, 50))
        wrapped = hm.wrap_angles(raw)
        np.testing.assert_allclose(np.diff(hm.unfold_angles(wrapped)), np.diff(raw), atol=1e-9)

    def test_curvature_of_circle(self):
        t = np.linspace(0, np.pi, 200)
        r = 2.0
        kappa = hm.calculate_curvature(r * np.cos(t), r * np.sin(t), t)
        np.testing.assert_allclose(kappa[10:-10], 1.0 / r, atol=1e-3)

    def test_tangent_of_line(self):
        t = np.linspace(0, 1, 50)
        tang = hm.calculate_tangent(t, t, t)
        np.testing.assert_allclose(tang, np.pi / 4, atol=1e-6)

    def test_reparametrize_path_uniform(self):
        path = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]])
        out = hm.reparametrize_path(path, 9)
        assert out.shape == (9, 2)
        np.testing.assert_allclose(out[0], path[0], atol=1e-6)
        np.testing.assert_allclose(out[-1], path[-1], atol=1e-6)

    def test_orthogonal_projection_on_segment(self):
        traj = np.array([[0.0, 0.0], [2.0, 0.0]])
        par = np.array([0.0, 1.0])
        s = hm.find_orthogonal_projection(traj, np.array([1.0, 0.5]), par)
        np.testing.assert_allclose(s, 0.5, atol=1e-5)

    def test_orthogonal_projection_beyond_end_uses_vertex(self):
        traj = np.array([[0.0, 0.0], [2.0, 0.0]])
        par = np.array([0.0, 1.0])
        s = hm.find_orthogonal_projection(traj, np.array([3.0, 0.1]), par)
        np.testing.assert_allclose(s, 1.0, atol=1e-6)


class TestPosition2:
    def test_compose_inverse_identity(self):
        rng = np.random.RandomState(1)
        p = Position2(rng.randn(5), rng.randn(5), rng.uniform(-np.pi, np.pi, 5))
        ident = p * p.inv()
        np.testing.assert_allclose(ident.x, 0, atol=1e-9)
        np.testing.assert_allclose(ident.y, 0, atol=1e-9)
        np.testing.assert_allclose(ident.rotation, 0, atol=1e-9)

    def test_apply_matches_compose(self):
        p = Position2(1.0, 2.0, 0.7)
        pts = np.array([[0.5, -0.3], [1.0, 1.0]])
        applied = p.apply(pts)
        for k in range(2):
            q = p * Position2(pts[k, 0], pts[k, 1], 0.0)
            np.testing.assert_allclose(applied[k], [q.x, q.y], atol=1e-9)

    def test_vec_roundtrip(self):
        vec = np.array([[1.0, 2.0, 0.3], [4.0, 5.0, -1.2]])
        np.testing.assert_allclose(Position2.from_vec(vec).as_vec(), vec)

    def test_quaternion_roundtrip(self):
        p = Position2(0.0, 0.0, 1.234)
        q = p.as_quaternion()
        p2 = Position2.from_quaternion(0.0, 0.0, *q)
        np.testing.assert_allclose(p2.rotation, 1.234, atol=1e-9)

    def test_len(self):
        assert len(Position2(1.0, 2.0, 0.0)) == 1
        assert len(Position2(np.zeros(4), np.zeros(4), np.zeros(4))) == 4
