"""Driver entry points compile and run (CPU, 8 virtual devices)."""

import sys

import jax
import numpy as np


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    logits, value = jax.jit(fn)(*args)
    assert logits.shape == (64, 2, 18)
    assert value.shape == (64, 2)
    assert np.isfinite(np.asarray(logits)).all()


def test_dryrun_multichip_eight_devices(capsys):
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
    assert "OK" in capsys.readouterr().out
