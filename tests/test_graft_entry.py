"""Driver-contract tests for __graft_entry__.

The driver compile-checks `entry()` single-chip and runs `dryrun_multichip(N)`
on a virtual N-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count).
These tests execute both contracts in-process on the 8-device test mesh so a
regression is caught before the round-end driver run (round-1 failure:
MULTICHIP_r01 ok=false because the dryrun touched the ambient TPU client).
"""

import sys
from pathlib import Path

import jax
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = jax.block_until_ready(out)
    # Flagship RON-320: flat per-anchor outputs for 21,250 anchors.
    leaves = jax.tree.leaves(out)
    assert leaves, "entry() produced no outputs"
    assert all(l.shape[0] == 1 for l in leaves)


@pytest.mark.slow
def test_dryrun_multichip_8_devices():
    assert len(jax.devices("cpu")) >= 8
    graft.dryrun_multichip(8)  # asserts finite loss internally


@pytest.mark.slow
def test_dryrun_multichip_2_devices():
    # Cheap variant kept un-marked so every test run exercises the path.
    graft.dryrun_multichip(2)
