"""Multi-host initialization.

The reference never leaves one host (its only "collective" is an mp.Queue
gather, base.py:366). For pod-scale runs every host calls
`initialize_distributed()` before building the mesh; `jax.devices()` then
spans the pod, region/spatial sharding and psum reductions ride ICI/DCN
unchanged (shard_map is SPMD across processes).
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU pod runtime's automatic discovery when all are None).

    Returns a summary dict; a no-op when running single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return {"distributed": False, "process_index": 0,
                "process_count": 1, "n_devices": len(jax.devices())}

    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return {"distributed": True,
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "n_devices": len(jax.devices()),
            "n_local_devices": len(jax.local_devices())}
