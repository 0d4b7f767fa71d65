"""Driver-contract tests: entry() compiles and runs; dryrun_multichip
executes a full DP training step on the virtual 8-device mesh."""

import sys

import jax
import numpy as np


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (256, 256, 3)
    assert np.all(np.isfinite(out))


def test_dryrun_multichip():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
