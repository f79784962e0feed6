"""Multi-process (multi-host) execution helpers.

The reference's multi-node story was a dead mpi4py scaffold: a per-epoch
weight bcast and an experience gather to rank 0 (reference:
train/policy/multi_ppo.py:179-181, 320-325) whose import was commented out
(:162-164). Here multi-host is the standard JAX multi-controller model:
every process runs the same program over ONE global mesh; the env batch
shards over the mesh's 'data' axis (each host computes its local env
lanes), parameters replicate, and GSPMD inserts the cross-host collectives
that the MPI calls used to hand-roll.

On a real pod `jax.distributed.initialize()` self-configures; on CPU
fleets / tests the coordinator is passed via env vars (see
`distributed_init_from_env`). `tests/test_multihost.py` exercises a real
2-process run on localhost.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init_from_env() -> bool:
    """Initialize jax.distributed from environment variables; returns True
    when running multi-process. Env contract (mirrors the standard
    coordinator handshake):

      RVO3D_COORDINATOR   host:port of process 0
      RVO3D_NUM_PROCESSES total process count
      RVO3D_PROCESS_ID    this process's rank
    """
    addr = os.environ.get("RVO3D_COORDINATOR")
    if not addr:
        # fall back to cluster auto-detection (TPU pod / SLURM), mirroring
        # the original maybe_distributed_init hook
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            return True
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["RVO3D_NUM_PROCESSES"]),
        process_id=int(os.environ["RVO3D_PROCESS_ID"]),
    )
    return True


def is_coordinator() -> bool:
    """True on the process that owns checkpointing / logging (replaces the
    reference's rank-0 gather-and-update, multi_ppo.py:320-325)."""
    return jax.process_index() == 0


def global_put(tree: Any, mesh: Mesh,
               spec_fn: Callable[[Any], P]) -> Any:
    """Place a host-local PyTree (every process holds the FULL array, e.g.
    broadcast-from-reset env state or identically-seeded params) onto a
    global mesh. Works in both single- and multi-process mode: unlike
    jax.device_put, make_array_from_callback only asks each process for the
    shards it can address."""

    def place(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec_fn(x))
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree_util.tree_map(place, tree)


def global_shard_carry(carry: Any, mesh: Mesh, num_envs: int) -> Any:
    """Multi-process analogue of parallel.sharding.shard_carry: leaves with
    leading axis E shard over 'data', everything else replicates."""

    def spec(x):
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return P("data", *([None] * (x.ndim - 1)))
        return P()

    return global_put(carry, mesh, spec)


def global_replicate(tree: Any, mesh: Mesh) -> Any:
    return global_put(tree, mesh, lambda x: P())
