"""Driver entry points: single-chip compile + multi-chip dry run."""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")
import __graft_entry__ as entrymod  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = entrymod.entry()
    out = jax.jit(fn)(*args)
    x = np.asarray(out.p.x)
    assert np.isfinite(x[: (np.asarray(out.p.material) >= 0).sum()]).all()


def test_dryrun_multichip_8():
    entrymod.dryrun_multichip(8)
