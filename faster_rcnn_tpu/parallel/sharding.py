"""Parameter sharding rules: tensor parallelism for the wide head layers.

SURVEY.md §2 parallelism plan: data parallel is the primary axis; the 'model'
mesh axis carries the VGG16 detector head's 4096-wide fc layers (25088x4096
and 4096x4096 = 118M of the model's parameters) as Megatron-style
column-parallel fc1 + row-parallel fc2.  We express this purely as
NamedSharding placements on the parameter tree — GSPMD propagates the
activations shardings and inserts the single all-reduce after fc2; no manual
collectives.

Everything else (convs, small dense heads, BN) is replicated: at these layer
sizes the matmuls are already MXU-efficient per chip and replication avoids
collective latency on the critical path.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _pspec_for(path: Tuple[str, ...]) -> P:
    keys = list(path)
    if "fc1" in keys:
        # column parallel: output features sharded
        return P(None, "model") if keys[-1] == "kernel" else P("model")
    if "fc2" in keys:
        # row parallel: input features sharded, bias replicated (added after
        # the psum that GSPMD inserts)
        return P("model", None) if keys[-1] == "kernel" else P()
    return P()


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a parameter tree under ``mesh``."""

    def one(path, _):
        keys = tuple(p.key for p in path)
        return NamedSharding(mesh, _pspec_for(keys))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter tree onto the mesh per the TP rules."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, param_shardings(params, mesh)
    )
