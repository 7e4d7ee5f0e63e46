"""Driver-contract tests for __graft_entry__.py."""
import pathlib
import sys

import jax
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_is_jittable():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    trajectories, losses = out
    assert trajectories.shape == (8, 32, 3)
    assert losses.shape == (8,)
    assert np.isfinite(np.asarray(losses)).all()


def test_dryrun_multichip_on_virtual_mesh():
    graft.dryrun_multichip(len(jax.devices()))


def test_dryrun_multichip_on_device_subset():
    # a 2-device mesh over a subset of the host's devices — the exact call
    # shape the driver uses must work for any n <= device count
    graft.dryrun_multichip(2)
