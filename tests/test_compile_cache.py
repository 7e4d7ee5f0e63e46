"""enable_tpu_compile_cache must refuse to arm the cache on CPU backends.

The persistent cache holds CPU AOT executables compiled on a different
machine (feature-incompatible — diverging numerics observed); the helper
gates on the ACTUAL backend, not a --cpu flag, so a TPU-init failure that
falls back to CPU stays cache-free.
"""
import jax

from nfopp_tpu.utils import enable_tpu_compile_cache


def test_cache_disabled_on_cpu_backend():
    # conftest pins the test session to the CPU backend
    assert jax.default_backend() == "cpu"
    assert enable_tpu_compile_cache() is False
    assert not jax.config.jax_compilation_cache_dir
