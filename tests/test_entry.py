"""Driver entry-point tests: entry() compiles and runs; dryrun_multichip
executes on the virtual 8-device mesh."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    img = jax.jit(fn)(*args)
    img = np.asarray(jax.block_until_ready(img))
    assert img.shape == (24, 32, 3)
    assert np.all(np.isfinite(img))


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(4)
