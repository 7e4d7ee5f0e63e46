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
import time
from typing import Any, Callable, NamedTuple

import jax

__all__ = [
    "AotProgram",
    "aot_key",
    "aot_or_compile",
    "aot_path",
    "content_digest",
    "save_aot",
    "shape_digest",
    "source_digest",
    "try_load_aot",
]

_AOT_DIR_NAME = "aot"


def _aot_root():
    import pathlib

    # sibling of the persistent compile cache at the repo root
    root = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
    return root / _AOT_DIR_NAME


_SOURCE_DIGEST_CACHE: str | None = None


def source_digest() -> str:
    """Digest of the framework's own Python sources (every nfopp_tpu/**/*.py,
    path + contents). Mixed into every aot_key so ANY library edit misses the
    cache and recompiles — without it a stale executable compiled from old
    solver code would silently report old-code performance/feasibility into
    committed artifacts (conservative by design: an unrelated edit only costs
    one recompile). Cached per process."""
    global _SOURCE_DIGEST_CACHE
    if _SOURCE_DIGEST_CACHE is None:
        import pathlib

        pkg = pathlib.Path(__file__).resolve().parents[1]
        h = hashlib.sha256()
        for p in sorted(pkg.rglob("*.py")):
            h.update(str(p.relative_to(pkg)).encode())
            h.update(p.read_bytes())
        _SOURCE_DIGEST_CACHE = h.hexdigest()[:16]
    return _SOURCE_DIGEST_CACHE


def content_digest(tree: Any) -> str:
    """Digest of a pytree's ARRAY CONTENTS (shapes, dtypes, bytes). Use for
    closure-captured constants — e.g. a bench program bakes its oracle scene
    into the executable as literals, so a scene edit must change the key."""
    import numpy as np

    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:16]


def shape_digest(tree: Any) -> str:
    """Digest of a pytree's STRUCTURE (treedef + leaf shapes/dtypes, not
    contents). Use for program ARGUMENTS — a program is specialized to its
    arg shapes but not their values (contrast content_digest for
    closure-baked constants)."""
    import numpy as np

    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(str(treedef).encode())
    for leaf in leaves:
        shape = getattr(leaf, "shape", np.shape(leaf))
        dtype = getattr(leaf, "dtype", np.asarray(leaf).dtype)
        h.update(f"{shape}{dtype}".encode())
    return h.hexdigest()[:16]


def aot_key(name: str, *signature_parts) -> str:
    """Content key: name + jax/device identity + the framework source digest
    + caller-supplied signature parts (configs, batch sizes, content_digest()
    of closure constants — anything whose change invalidates the executable).
    Parts are stringified; NamedTuple configs repr their full contents, which
    is exactly what we want."""
    device = jax.devices()[0]
    ident = "|".join(
        [
            name,
            jax.__version__,
            getattr(device, "device_kind", str(device)),
            str(jax.device_count()),
            f"py{sys.version_info.major}.{sys.version_info.minor}",
            source_digest(),
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


class AotProgram(NamedTuple):
    """A compiled program plus its provenance (see aot_or_compile)."""

    fn: Callable  # call with the FULL arg list; baked statics are stripped
    loaded: bool  # True = deserialized from the AOT store (compile bypassed)
    seconds: float  # wall time of the load or of the compile
    key: str

    def __call__(self, *args):
        return self.fn(*args)


def aot_or_compile(
    name: str,
    jit_fn,
    example_args: tuple,
    *key_parts,
    static_argnums: tuple = (),
    allow_cpu: bool = False,
    enabled: bool = True,
    verbose: bool = False,
) -> AotProgram:
    """Load the executable for (`name`, key_parts) from the AOT store, or
    lower+compile `jit_fn` on `example_args` and save it — the shared
    compile-service-independence helper behind bench.py, the suite runners,
    and the serving sessions.

    The key automatically includes the framework source digest (aot_key);
    callers add configs/batch sizes and content_digest() of closure-captured
    constants. `static_argnums` lists positions in `example_args` that the
    jitted function treats as static: a jax Compiled executable is called
    WITHOUT its baked statics, so the returned wrapper strips those positions
    and the caller keeps one calling convention either way.

    `enabled=False` skips the store entirely (plain lower/compile) so callers
    can thread a --no-aot flag through without branching.
    """

    def strip(args):
        return tuple(a for i, a in enumerate(args) if i not in static_argnums)

    key = aot_key(name, *key_parts)
    if enabled:
        t0 = time.time()
        loaded = try_load_aot(key, allow_cpu=allow_cpu)
        if loaded is not None:
            secs = time.time() - t0
            if verbose:
                print(
                    f"AOT {name} loaded in {secs:.1f}s — compile bypassed",
                    file=sys.stderr, flush=True,
                )
            if static_argnums:
                return AotProgram(
                    lambda *a: loaded(*strip(a)), True, secs, key
                )
            return AotProgram(loaded, True, secs, key)
    t0 = time.time()
    compiled = jit_fn.lower(*example_args).compile()
    secs = time.time() - t0
    if enabled and save_aot(compiled, key, allow_cpu=allow_cpu) and verbose:
        print(f"AOT {name} compiled in {secs:.1f}s and saved",
              file=sys.stderr, flush=True)
    if static_argnums:
        return AotProgram(lambda *a: compiled(*strip(a)), False, secs, key)
    return AotProgram(compiled, False, secs, key)
