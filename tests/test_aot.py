"""AOT executable serialization (utils/aot.py) — key semantics and the
graceful-miss contract. The hardware round-trip (deserialize on the axon TPU
backend and run without the compile service) is validated by the bench run
itself and recorded in BASELINE_MEASURED.md; executables are machine-specific
so a cross-machine CPU round-trip is deliberately out of scope (CLAUDE.md:
.jax_cache is TPU-only for the same reason).
"""
import numpy as np

from nfopp_tpu.solver import SolverConfig
from nfopp_tpu.utils.aot import (
    aot_key,
    aot_or_compile,
    aot_path,
    content_digest,
    save_aot,
    source_digest,
    try_load_aot,
)


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


def test_key_includes_code_identity(monkeypatch):
    """ADVICE r4 (medium): a solver-code edit must invalidate AOT artifacts —
    the key mixes in a digest of the whole nfopp_tpu source tree."""
    import nfopp_tpu.utils.aot as aot_mod

    base = aot_key("code-ident", 1)
    assert source_digest() == source_digest()  # cached + deterministic
    monkeypatch.setattr(aot_mod, "_SOURCE_DIGEST_CACHE", "deadbeefdeadbeef")
    assert aot_key("code-ident", 1) != base


def test_content_digest_covers_scene_constants():
    """Closure-baked scene arrays (the bench oracle) are keyed by CONTENT:
    same shapes, different values => different executables."""
    a = {"pts": np.zeros((4, 2), np.float32), "r": np.float32(0.3)}
    b = {"pts": np.zeros((4, 2), np.float32), "r": np.float32(0.3)}
    assert content_digest(a) == content_digest(b)
    b["pts"] = b["pts"] + 1.0
    assert content_digest(a) != content_digest(b)
    # dtype/shape changes alone also miss
    c = {"pts": np.zeros((4, 2), np.float64), "r": np.float32(0.3)}
    assert content_digest(a) != content_digest(c)


def test_aot_or_compile_round_trip(tmp_path, monkeypatch):
    """aot_or_compile compiles+saves on a miss, loads on a hit, and strips
    baked static args so both paths share one calling convention."""
    import jax
    import jax.numpy as jnp

    import nfopp_tpu.utils.aot as aot_mod

    monkeypatch.setattr(aot_mod, "_aot_root", lambda: tmp_path)
    jit_fn = jax.jit(lambda x, n: x * n, static_argnums=(1,))
    x = jnp.arange(3, dtype=jnp.float32)
    p1 = aot_or_compile(
        "round-trip", jit_fn, (x, 3), "k", static_argnums=(1,),
        allow_cpu=True,
    )
    assert not p1.loaded
    np.testing.assert_allclose(np.asarray(p1(x, 3)), [0.0, 3.0, 6.0])
    p2 = aot_or_compile(
        "round-trip", jit_fn, (x, 3), "k", static_argnums=(1,),
        allow_cpu=True,
    )
    # second call deserializes (same process/machine). Executing the
    # DESERIALIZED program is out of scope here: on the 8-device CPU test
    # backend deserialize_and_load rebuilds a contradictory device
    # assignment (wants 8 arg shards yet requires SingleDeviceSharding) —
    # the execute-after-load contract is proven on the real 1-chip TPU by
    # bench.py --aot (BASELINE_MEASURED.md).
    assert p2.loaded
    # different key part misses
    p3 = aot_or_compile(
        "round-trip", jit_fn, (x, 3), "other", static_argnums=(1,),
        allow_cpu=True,
    )
    assert not p3.loaded
    # enabled=False bypasses the store entirely
    p4 = aot_or_compile(
        "round-trip", jit_fn, (x, 3), "k", static_argnums=(1,),
        allow_cpu=True, enabled=False,
    )
    assert not p4.loaded
