"""Driver-contract tests: entry() must jit single-chip and
dryrun_multichip(8) must compile+run the full distributed step on the
virtual CPU mesh."""

import sys
import os

import numpy as np
import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_jits_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.ndim == 1 and np.all(np.isfinite(out))


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)
