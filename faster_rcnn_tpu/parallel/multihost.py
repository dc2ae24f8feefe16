"""Multi-host (multi-process) training support.

The reference is strictly single-process (SURVEY.md §2/§5.8: no distributed
backend of any kind).  This module is the TPU-native scaling story beyond one
host: a DCN-aware global mesh plus a per-host input path, following the
standard JAX multi-controller recipe:

  * every process calls :func:`maybe_initialize` once (no-op unless launched
    in a multi-process environment or explicitly requested);
  * the mesh spans ALL devices (``jax.devices()``), data axis ordered
    process-major so each host's batch shard lands on its own local chips and
    gradient all-reduce rides ICI within a slice / DCN across slices;
  * each host loads only its slice of the dataset
    (:func:`shard_records_for_host`) and materializes its local part of the
    global batch with ``jax.make_array_from_process_local_data``
    (:func:`global_batch`) — no host ever touches another host's data.

Single-process behavior is identical to the local path (process_count == 1
makes every helper degenerate to the plain mesh/device_put case), which is
how the CI suite exercises this module on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(require: bool = False) -> bool:
    """Initialize jax.distributed when running multi-process.

    Returns True if the distributed runtime is (already) initialized.  Safe
    to call unconditionally: without coordinator configuration
    (JAX_COORDINATOR_ADDRESS / cloud TPU metadata) and ``require=False`` it
    leaves single-process mode untouched.
    """
    if jax.process_count() > 1:
        return True  # already initialized by the launcher
    want = require or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not want:
        return False
    try:
        jax.distributed.initialize()
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-process without coordinator
        return jax.process_count() > 1


def global_mesh(model: int = 1) -> Mesh:
    """('data', 'model') mesh over every device of every process.

    ``jax.devices()`` orders devices process-major, so contiguous blocks of
    the data axis are process-local: each host's input shard maps onto its
    own chips and cross-host traffic is only the gradient reduction.
    """
    devices = jax.devices()
    data = len(devices) // model
    return Mesh(np.asarray(devices[: data * model]).reshape(data, model), ("data", "model"))


def shard_records_for_host(records: Sequence, *, process_index: int = None,
                           process_count: int = None) -> Sequence:
    """Deterministic per-host dataset shard (round-robin by index)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(records)[pi::pc]


def local_batch_size(global_batch_size: int) -> int:
    pc = jax.process_count()
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process count {pc}"
        )
    return global_batch_size // pc


def global_batch(mesh: Mesh, local: Dict[str, np.ndarray],
                 global_batch_size: int) -> Dict[str, jax.Array]:
    """Assemble the global sharded batch from this process's local arrays.

    ``local`` holds (local_B, ...) numpy arrays; the result is a pytree of
    globally-shaped jax.Arrays sharded (batch,) -> 'data'.  With one process
    this is exactly ``shard_batch``.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        global_shape = (global_batch_size,) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, np.asarray(x), global_shape)

    return {k: put(v) for k, v in local.items()}


def global_keys(mesh: Mesh, key: jax.Array, global_batch_size: int) -> jax.Array:
    """Per-image RNG keys as a global sharded array.

    Every process derives the SAME global key sequence (deterministic across
    hosts) and contributes its local slice, so key assignment is independent
    of the number of hosts.
    """
    all_keys = np.asarray(jax.random.split(key, global_batch_size))
    lb = local_batch_size(global_batch_size)
    lo = jax.process_index() * lb
    sharding = NamedSharding(mesh, P("data"))
    return jax.make_array_from_process_local_data(
        sharding, all_keys[lo:lo + lb], (global_batch_size,) + all_keys.shape[1:]
    )
