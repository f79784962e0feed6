"""Sharding placement helpers.

Design (SURVEY §2.3): the env-batch axis E is the scaling axis — env state,
observations and rollout buffers shard over mesh axis 'data'; model
parameters replicate by default (the model is ~1 M params) or tensor-shard
their hidden dimensions over 'model' when a TP axis is present. Gradient
reduction across data shards is inserted by GSPMD from the jnp.mean in the
losses — no hand-written collectives needed on the compute path.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def data_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    spec = [None] * ndim
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_carry(carry: Any, mesh: Mesh, num_envs: int) -> Any:
    """Shard leaves of a rollout carry / env-state PyTree whose leading axis
    is the env batch E along 'data'; everything else (RNG key, per-agent
    stats, scalars) replicates."""

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, data_sharding(mesh, x.ndim, 0))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(place, carry)


# Tensor-parallel rules for the actor/critic MLPs and the GRU:
#   dense kernels [in, out]: hidden layers shard the output dim, the final
#   layer shards the input dim (Megatron column->row pattern);
#   GRU weights shard the packed gate dim.
_TP_RULES = [
    (re.compile(r".*(actor|critic)/dense_0/kernel"), P(None, "model")),
    (re.compile(r".*(actor|critic)/dense_0/bias"), P("model")),
    (re.compile(r".*(actor|critic)/dense_1/kernel"), P("model", None)),
    (re.compile(r".*(fwd|bwd)/w_ih"), P(None, "model")),
    (re.compile(r".*(fwd|bwd)/w_hh"), P(None, "model")),
    (re.compile(r".*(fwd|bwd)/b_ih"), P("model")),
    (re.compile(r".*(fwd|bwd)/b_hh"), P("model")),
]


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place parameters with tensor-parallel shardings over 'model' where a
    rule matches; replicate the rest. With mesh model=1 this is pure
    replication (TP becomes a mesh-shape change, not a code change)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    placed = []
    for path, leaf in flat:
        name = "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        spec = P()
        for pat, s in _TP_RULES:
            if pat.match(name):
                spec = s
                break
        placed.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)
