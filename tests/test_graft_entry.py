"""Driver entry points must work at several device counts (the driver picks N)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (32, 174)
    assert np.isfinite(out).all()


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)
