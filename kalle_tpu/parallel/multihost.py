"""Multi-host initialization + host-local data utilities.

The reference's multi-process story is accelerate's static single-node
rendezvous (default_config.yaml:15-17). TPU pods instead use
jax.distributed over DCN: every host runs the same program, the global mesh
spans all chips, and each host feeds its own data shard
(OfflineLatentDataset(shard_index=process_index, shard_count=process_count)).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize, no-op on single host / already-init."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None and "COORDINATOR_ADDRESS" not in os.environ:
        return  # single host
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except RuntimeError:
        pass  # already initialized


def process_info():
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """accelerator.is_main_process equivalent (ref train_offline.py:262)."""
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """accelerator.wait_for_everyone equivalent (ref train_offline.py:259):
    a psum over a scalar forces a cross-host sync point."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def host_local_to_global(batch, mesh, leading_accum: bool = False):
    """Assemble per-host batch shards into a global array on the dp mesh.
    leading_accum=True: leaves are (A, B, ...) microbatch stacks — the dp
    axis is axis 1 (train_step gradient-accumulation contract)."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    spec = P(None, "dp") if leading_accum else P("dp")
    return multihost_utils.host_local_array_to_global_array(
        batch, mesh, spec)
