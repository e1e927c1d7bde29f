"""Driver entry points stay working: entry() compiles, dryrun executes."""
import jax
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles_single_device():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8,)
