"""The driver's entry points must work headless: entry() compiles and runs
single-device; dryrun_multichip exercises the full sharded step on the
8-virtual-device CPU mesh."""

import sys
import pathlib

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    units, bits = jax.block_until_ready(out)
    assert units.shape[0] == 64  # 64 stripes
    b = np.asarray(bits)
    assert (b > 0).all()
    # payload should compress: well under 8 bits/pixel
    assert b.sum() < 512 * 512 * 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    ge.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 devices")
def test_dryrun_two_devices():
    ge.dryrun_multichip(2)
