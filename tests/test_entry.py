"""Driver entry points (__graft_entry__) must stay jittable — the round
driver compile-checks entry() and executes dryrun_multichip()."""

import sys
from pathlib import Path

import numpy as np

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    x, r = jax.jit(fn)(*args)
    assert np.isfinite(float(r))
    assert x.ndim == 1
