"""Device mesh construction.

The reference's distributed story is a dead mpi4py scaffold (reference:
train/policy/multi_ppo.py:162-164,179-181,320-325 — import commented out).
Here distribution is first-class: a 2-D ('data', 'model') mesh where env
instances shard over 'data' (replacing the MPI experience gather) and
weights are replicated or tensor-sharded over 'model' (replacing the MPI
weight bcast). XLA collectives ride ICI within a slice; multi-host pods
extend the same mesh via jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = max(1, n // model)
    need = data * model
    if need > n:
        raise ValueError(f"mesh {data}x{model} needs {need} devices, have {n}")
    arr = mesh_utils.create_device_mesh((data, model),
                                        devices=devices[:need])
    return Mesh(arr, ("data", "model"))


def maybe_distributed_init() -> bool:
    """Multi-host initialization hook (no-op on a single host). On a pod,
    jax.distributed self-configures; on CPU fleets / tests the coordinator
    comes from the RVO3D_* env vars (parallel/multihost.py). Returns True
    when multi-process."""
    from rvo3d_tpu.parallel.multihost import distributed_init_from_env

    return distributed_init_from_env()
