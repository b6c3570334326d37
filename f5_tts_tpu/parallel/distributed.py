"""Multi-host initialization (the DCN extension point).

The single-program model code never changes across scales: `create_mesh` over
`jax.devices()` covers one chip through a full pod slice. For multi-host
(multiple processes over DCN), call `initialize()` first — a thin wrapper over
`jax.distributed.initialize` that reads the standard env vars — and build the
mesh over the global device set; GSPMD routes intra-slice collectives over ICI
and cross-host ones over DCN.

The reference has no distributed support at all (SURVEY.md §2c); this module
is the idiomatic-JAX scale-out path, not a reference-parity feature.
"""

from __future__ import annotations

import os

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. Args default to the JAX_* / cloud-TPU env
    vars; on single-host setups this is a no-op."""
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-host: nothing to initialize
    # pass None through: jax.distributed auto-detects the cluster topology
    # (e.g. Cloud TPU metadata); forcing num_processes=1 here would mis-form
    # a real multi-host pod
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_local_batch_slice(global_batch: int) -> slice:
    """The slice of a globally-sharded batch this process should load —
    the host-side contract for per-process data loading."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
