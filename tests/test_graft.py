"""Driver entry points: entry() compiles; dryrun_multichip executes."""

import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    graft.dryrun_multichip(3)  # tp falls back to 1
