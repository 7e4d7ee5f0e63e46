"""Test configuration: run JAX on a virtual 8-device CPU platform.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (and without touching the single exclusive-access
TPU this image tunnels to). This image's sitecustomize force-registers the
remote 'axon' TPU backend in every interpreter, so JAX_PLATFORMS env tweaks are
not enough — explicitly pin the platform via jax.config before any backend
initialization. XLA_FLAGS must be set before the CPU client spins up.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
