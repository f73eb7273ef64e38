"""Two-process jax.distributed dryrun (VERDICT r4 item 9): spawns two real
child processes that initialize a distributed CPU backend, build one global
dp mesh across both, feed per-host shards, and must reproduce the
single-process loss/gradients exactly (XLA inserts the cross-host psums).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def test_two_process_grad_parity():
    import multihost_dryrun

    verdict = multihost_dryrun.run_parent(num_processes=2, local_devices=2,
                                          timeout_s=420.0)
    assert verdict["ok"]
    for ch in verdict["children"]:
        assert ch["global_devices"] == 4
        assert ch["rel_dloss"] < 2e-4
        assert ch["rel_dgrad_norm"] < 2e-4
        assert ch["leaf_norms_ok"]
