"""Driver-contract guards: entry() traces, dryrun_multichip runs."""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    """entry() must return a jittable fn + args; eval_shape catches
    signature/shape breaks without compiling the 1B model."""
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == ()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    dryrun_multichip(3)  # odd count falls back to pure dp
