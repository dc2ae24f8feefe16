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

# Set by the first successful maybe_initialize() call.  The trainer's
# late-init guard consults this instead of jax.process_count()==1 (which
# falsely rejects a legitimately initialized 1-process distributed run) or
# exception-text matching (JAX-version-fragile) — advisor r3.
_INITIALIZED = False


def is_initialized() -> bool:
    """True if jax.distributed was successfully initialized in this process
    (via maybe_initialize, or by an external launcher that produced a
    multi-process cluster)."""
    if _INITIALIZED:
        return True
    try:
        return jax.process_count() > 1
    except Exception:
        return False


def maybe_initialize(require: bool = False) -> bool:
    """Initialize jax.distributed from the environment.

    MUST run before anything touches a JAX backend (``jax.devices()``,
    ``jax.process_count()``, any eager op) — ``jax.distributed.initialize``
    refuses to run afterwards.  The CLI therefore calls this at the very top
    of ``main`` when ``--multihost`` is passed.  Configuration is the env
    triple

        JAX_COORDINATOR_ADDRESS   host:port of process 0
        JAX_NUM_PROCESSES         total process count
        JAX_PROCESS_ID            this process's id

    (exactly the kwargs of ``jax.distributed.initialize``); managed TPU-pod
    launchers that publish their own cluster metadata need none of them.

    ``require=True`` (the CLI's ``--multihost``) hard-fails on a missing or
    broken configuration instead of silently degenerating to N independent
    single-process trainers that would each consume the full dataset and
    fight over one checkpoint directory.  Without ``require`` and without a
    coordinator address this is a no-op that never initializes a backend,
    which is how the single-process CI suite exercises the module.
    """
    global _INITIALIZED
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord and not require:
        return False
    if _INITIALIZED:
        return True  # first call already did the work (CLI top-of-main)
    kwargs = {}
    if coord:
        try:
            kwargs = dict(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        except KeyError as e:
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS is set but the companion variable "
                f"{e.args[0]} is not; set JAX_NUM_PROCESSES and JAX_PROCESS_ID too"
            ) from e
    try:
        jax.distributed.initialize(**kwargs)
        _INITIALIZED = True
        return True
    except Exception as e:  # raised for double-init, late init, or no cluster
        # secondary heuristics only (the module flag above is authoritative
        # for our own calls; these cover external launchers / direct
        # jax.distributed.initialize use)
        already = "already initialized" in str(e).lower()
        if already or (_backend_initialized() and jax.process_count() > 1):
            _INITIALIZED = True
            return True  # launcher / an earlier call did the work
        if require:
            raise RuntimeError(
                "--multihost requested but jax.distributed could not be "
                "initialized. Set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / "
                "JAX_PROCESS_ID (or run under a TPU pod launcher), and make "
                "sure maybe_initialize() runs before any other JAX call. "
                f"Original error: {e}"
            ) from e
        return False


def _backend_initialized() -> bool:
    """True if some JAX backend has already been created (safe, no side effects)."""
    try:
        return jax._src.xla_bridge._backends != {}  # noqa: SLF001
    except Exception:
        return True  # conservatively assume yes; caller only gates a re-check


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
