"""Multi-host / multi-slice initialization (T8's DCN half; SURVEY.md §5
"distributed communication backend": within a slice collectives ride ICI,
across slices they ride DCN via the standard JAX distributed runtime).

The reference is single-process (SURVEY.md §1) — this is new machinery.
One call per host process, before any other JAX use:

    from mla_tpu.parallel.distributed import initialize
    initialize()          # env-driven on Cloud TPU / GKE
    mesh = make_mesh(...) # now spans all hosts' devices

On a single host this is a no-op, so the same entry point works everywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; returns True
    if a multi-process runtime was started.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env > Cloud-TPU auto-detection
    (argument-free initialize) > single-process no-op.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES") and "," in os.environ.get(
        "TPU_WORKER_HOSTNAMES", ""
    ):
        # multi-worker Cloud TPU slice: argument-free init auto-detects
        jax.distributed.initialize()
        return True
    return False  # single process — nothing to do


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (per-host data loading:
    each host feeds only its shard; jax.make_array_from_process_local_data
    or device_put with a global sharding assembles the global array)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
