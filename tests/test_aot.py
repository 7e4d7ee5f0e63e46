"""AOT executable serialization (utils/aot.py) — key semantics and the
graceful-miss contract. The hardware round-trip (deserialize on the axon TPU
backend and run without the compile service) is validated by the bench run
itself and recorded in BASELINE_MEASURED.md; executables are machine-specific
so a cross-machine CPU round-trip is deliberately out of scope (CLAUDE.md:
.jax_cache is TPU-only for the same reason).
"""
import numpy as np

from nfopp_tpu.solver import SolverConfig
from nfopp_tpu.utils.aot import aot_key, aot_path, save_aot, try_load_aot


def test_key_is_deterministic_and_config_sensitive():
    c1 = SolverConfig(trajectory_length=32)
    c2 = SolverConfig(trajectory_length=64)
    k1 = aot_key("bench-run", c1, 256, 200)
    assert k1 == aot_key("bench-run", c1, 256, 200)
    assert k1 != aot_key("bench-run", c2, 256, 200)
    assert k1 != aot_key("bench-run", c1, 512, 200)
    assert k1 != aot_key("other", c1, 256, 200)
    assert k1.startswith("bench-run-")


def test_miss_returns_none():
    assert try_load_aot(aot_key("nonexistent-program", 0)) is None


def test_cpu_backend_is_gated_off():
    """On CPU (the test backend) save/load are no-ops unless explicitly
    allowed — CPU AOT artifacts embed build-machine features and must never
    be written into the shared .jax_cache (CLAUDE.md)."""
    import jax

    assert jax.devices()[0].platform == "cpu"
    key = aot_key("gated-test", 1)
    assert save_aot(object(), key) is False
    assert not aot_path(key).exists()
    assert try_load_aot(key) is None


def test_corrupt_artifact_is_a_miss(tmp_path, monkeypatch):
    import nfopp_tpu.utils.aot as aot_mod

    monkeypatch.setattr(aot_mod, "_aot_root", lambda: tmp_path)
    key = aot_key("corrupt-test", 2)
    p = tmp_path / f"{key}.pkl"
    p.write_bytes(b"not a pickle")
    assert try_load_aot(key, allow_cpu=True) is None
