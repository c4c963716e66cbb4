"""Driver-contract smoke tests for __graft_entry__ on the CPU mesh."""

import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8_devices():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles_small():
    """entry() uses flagship shapes (slow on CPU); compile-check the
    abstract signature only."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    shapes = jax.eval_shape(fn, *args)
    bs = args[1].shape[0]
    assert shapes.shape == (bs, 801, 2)
    assert shapes.dtype == np.float32
