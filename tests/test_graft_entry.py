"""Driver-contract checks: entry() compile + dryrun_multichip on the
virtual CPU mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge


def test_entry_jits():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    ge.dryrun_multichip(8)
