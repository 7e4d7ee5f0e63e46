"""AOT executable serialization — compile-service-independent startup.

The persistent XLA compile cache (utils/compile_cache.py) already makes warm
restarts fast, but a cache MISS still routes through the remote compile
service, which is erratic on this hardware (BENCH_r03's probe compile took
1203.6 s for a program that normally compiles in ~32 s). This module
serializes a fully-compiled executable (jax.experimental.serialize_executable
— the loaded-executable bytes + in/out trees) under an explicit content key,
so `bench.py --aot` can deserialize and run WITHOUT touching the compile
service at all; the only cost is deserialization + executable load.

Artifacts are keyed by (name, jax version, device kind, device count, config
signature): an executable is only valid on the topology it was compiled for.
Like the compile cache, artifacts are TPU-only by default — CPU AOT results
embed build-machine CPU features and are not portable (CLAUDE.md: the cache
held CPU executables from a different machine that produced diverging
numerics); pass allow_cpu=True only in same-process tests.
"""
from __future__ import annotations

import hashlib
import pickle
import sys

import jax

__all__ = ["aot_key", "aot_path", "save_aot", "try_load_aot"]

_AOT_DIR_NAME = "aot"


def _aot_root():
    import pathlib

    # sibling of the persistent compile cache at the repo root
    root = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    return root / _AOT_DIR_NAME


def aot_key(name: str, *signature_parts) -> str:
    """Content key: name + jax/device identity + caller-supplied signature
    parts (configs, batch sizes — anything whose change invalidates the
    executable). Parts are stringified; NamedTuple configs repr their full
    contents, which is exactly what we want."""
    device = jax.devices()[0]
    ident = "|".join(
        [
            name,
            jax.__version__,
            getattr(device, "device_kind", str(device)),
            str(jax.device_count()),
            f"py{sys.version_info.major}.{sys.version_info.minor}",
            *[repr(p) for p in signature_parts],
        ]
    )
    return f"{name}-{hashlib.sha256(ident.encode()).hexdigest()[:16]}"


def aot_path(key: str):
    return _aot_root() / f"{key}.pkl"


def _cpu_backend() -> bool:
    return jax.devices()[0].platform == "cpu"


def save_aot(compiled, key: str, allow_cpu: bool = False) -> bool:
    """Serialize a jax Compiled object under `key`. Returns True on success
    (False on CPU unless allow_cpu, or if the backend can't serialize)."""
    if _cpu_backend() and not allow_cpu:
        return False
    from jax.experimental import serialize_executable

    try:
        payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    except Exception:
        return False
    path = aot_path(key)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name("tmp-" + path.name)
    tmp.write_bytes(pickle.dumps((payload, in_tree, out_tree)))
    tmp.replace(path)
    return True


def try_load_aot(key: str, allow_cpu: bool = False):
    """Deserialize + load the executable under `key`, or None on any miss or
    failure (a stale artifact must never break the caller — it falls back to
    the normal compile path)."""
    if _cpu_backend() and not allow_cpu:
        return None
    path = aot_path(key)
    if not path.exists():
        return None
    from jax.experimental import serialize_executable

    try:
        payload, in_tree, out_tree = pickle.loads(path.read_bytes())
        return serialize_executable.deserialize_and_load(
            payload, in_tree, out_tree
        )
    except Exception:
        return None
