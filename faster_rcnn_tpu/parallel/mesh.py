"""Device mesh + sharding helpers.

The reference has no distributed support at all (SURVEY.md §2 parallelism
table: single process, batch 1, serial loop).  The TPU framework scales by
data parallelism over a 1-D ('data',) mesh — images are embarrassingly
parallel through the whole fused train step — with an optional 'model' axis
reserved for tensor-parallel fc layers (VGG's 4096-wide head).

Everything rides jax.sharding: params replicated, batch dims sharded on
'data'; XLA inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """1- or 2-D mesh over the available devices: ('data', 'model')."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree of (B, ...) arrays onto the mesh, B split on 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
