"""Real multi-process jax.distributed test (SURVEY.md §2 communication job 2).

Launches scripts/run_multihost.py twice (2 processes, localhost coordinator,
4 forced CPU host devices each) and asserts the global mesh spans 8 devices
across both processes, the cross-host psum metric reduction executes, and the
result matches a single-process 8-device run of the same global batch
(init keys are split from the same root key, so the math is identical —
only the process/sharding topology differs).

The reference has no distributed code at all (SURVEY.md §2); this exercises
the DCN-path code (`initialize_distributed`, parallel/mesh.py) for real.
Skips with the failure mode printed if jax.distributed is unsupported in the
image (e.g. no gloo CPU collectives).
"""
from __future__ import annotations

import json
import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "scripts" / "run_multihost.py"

STEPS = 20
BATCH_PER_HOST = 4  # global batch 8 in the 2-process run


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}"
    )
    env["JAX_PLATFORMS"] = "cpu"
    # The image's sitecustomize force-registers the remote axon TPU backend
    # (initializing XLA before jax.distributed.initialize can run) whenever
    # PALLAS_AXON_POOL_IPS is set; drop it so these CPU-only subprocesses
    # start with an uninitialized backend.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _launch(coordinator: str, num_processes: int, process_id: int,
            batch_per_host: int, n_local: int, out: pathlib.Path,
            log: pathlib.Path):
    cmd = [
        sys.executable, str(SCRIPT), "--cpu",
        "--num-processes", str(num_processes),
        "--process-id", str(process_id),
        "--batch-per-host", str(batch_per_host),
        "--steps", str(STEPS),
        "--json-out", str(out),
    ]
    if num_processes > 1:
        cmd += ["--coordinator", coordinator]
    # stdout goes to a FILE, not a pipe: the two processes are coupled by the
    # distributed barrier, so a full 64 KB pipe buffer on one would deadlock
    # the sequential communicate() on the other.
    return subprocess.Popen(
        cmd, env=_env(n_local), cwd=str(REPO),
        stdout=log.open("w"), stderr=subprocess.STDOUT, text=True,
    )


def test_two_process_distributed_matches_single_process(tmp_path):
    coordinator = f"localhost:{_free_port()}"
    outs = [tmp_path / f"host{i}.json" for i in range(2)]
    logfiles = [tmp_path / f"host{i}.log" for i in range(2)]
    procs = [
        _launch(coordinator, 2, i, BATCH_PER_HOST, 4, outs[i], logfiles[i])
        for i in range(2)
    ]
    try:
        for p in procs:
            p.wait(timeout=600)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    logs = [f.read_text() for f in logfiles]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            tail = "\n".join(logs[i].splitlines()[-25:])
            if "distributed" in tail.lower() or "gloo" in tail.lower():
                pytest.skip(
                    f"jax.distributed unsupported in this image:\n{tail}"
                )
            pytest.fail(f"process {i} failed (rc={p.returncode}):\n{tail}")

    results = [json.loads(o.read_text()) for o in outs]
    for i, r in enumerate(results):
        assert r["num_processes"] == 2, r
        assert r["global_devices"] == 8, r
        assert r["local_devices"] == 4, r
        assert r["total_batch"] == 2 * BATCH_PER_HOST, r
    # the psum'd global metric must agree across processes
    assert results[0]["mean_loss"] == pytest.approx(results[1]["mean_loss"],
                                                    rel=1e-6)

    # single-process control: same global batch on an 8-device local mesh
    out_single = tmp_path / "single.json"
    log_single = tmp_path / "single.log"
    p = _launch("", 1, 0, 2 * BATCH_PER_HOST, 8, out_single, log_single)
    try:
        p.wait(timeout=600)
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()
    assert p.returncode == 0, "\n".join(
        log_single.read_text().splitlines()[-25:]
    )
    single = json.loads(out_single.read_text())
    assert single["global_devices"] == 8

    assert results[0]["mean_loss"] == pytest.approx(single["mean_loss"],
                                                    rel=1e-4)
    assert results[0]["mean_final_xy"] == pytest.approx(
        single["mean_final_xy"], rel=1e-4
    )
