"""Multi-host wiring: one call turns a per-host process into a pod member.

The reference has no distributed layer at all (SURVEY 2.4); this framework
scales past one host the standard JAX way: every process calls
``initialize_multihost()`` at startup (before any other backend use), after
which ``jax.devices()`` is the GLOBAL device list, ``parallel.mesh.make_mesh``
builds a pod-wide mesh, and the sharded train/infer steps work unchanged --
XLA routes collectives over ICI within a slice and DCN across slices.

On TPU pods the coordinator/process topology is auto-detected from the TPU
environment, so ``initialize_multihost()`` with no arguments is enough. For
CPU/GPU clusters (and the localhost smoke test in
tests/test_multihost.py), pass coordinator_address/num_processes/process_id
explicitly or via the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID environment variables.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids: Optional[Sequence[int]] = None) -> dict:
    """Join (or form) a multi-process JAX job. Call before any backend use.

    Arguments default to the JAX_* environment variables, and on TPU to the
    values auto-detected from the pod metadata. Returns a summary dict
    (process index/count, local/global device counts) for logging.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": jax.device_count(),
    }


def is_distributed() -> bool:
    return jax.process_count() > 1


def local_batch_to_global(mesh, local_batch, axis: int = 0):
    """Assemble per-process batch shards into one dp-sharded global array.

    Each process passes its LOCAL slice of the batch (shape
    ``global_batch / num_processes`` on ``axis``); returns the global jax.Array
    sharded batch-on-dp over ``mesh``. Single-process: equivalent to a plain
    device_put with the same sharding.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    local_batch = np.asarray(local_batch)
    spec = [None] * local_batch.ndim
    spec[axis] = "dp"
    sharding = NamedSharding(mesh, P(*spec))
    global_shape = list(local_batch.shape)
    global_shape[axis] *= jax.process_count()
    return jax.make_array_from_process_local_data(
        sharding, local_batch, tuple(global_shape))
