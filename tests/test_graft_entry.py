"""The driver entry points must stay green: `entry()` compile-checks the
flagship kernel, `dryrun_multichip(n)` must self-provision an n-device
virtual CPU mesh (the driver runs it on a machine with a single real chip).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import __graft_entry__ as graft


def test_entry_jits():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[1] == 10


def test_dryrun_multichip_self_provisions():
    # runs in a subprocess with its own 4-device CPU mesh regardless of the
    # caller's backend state
    graft.dryrun_multichip(4)
