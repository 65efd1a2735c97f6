"""Multi-host (DCN) support.

The reference is strictly single-GPU (SURVEY.md §2 "Parallelism"); sv3d_tpu
scales across hosts the TPU-native way: `jax.distributed.initialize` joins the
processes, `jax.devices()` then spans every chip in the slice, the (dp, sp)
mesh (sv3d_tpu/parallel/mesh.py) is laid out over the GLOBAL device list, and
XLA routes collectives over ICI within a host's chips and DCN across hosts.
Nothing else in the framework changes: shardings are global, each process
feeds only its local slice of every batch and only process 0 writes
checkpoints/logs.

Single-host is the common case and every helper here degrades to a no-op /
identity, so the same trainer code runs unchanged in both modes.

Division of labor per process:
  * DataLoader(process_index, process_count) loads rows
    [i*B/P, (i+1)*B/P) of every global batch (sv3d_tpu/data/loader.py);
    partial final batches are wraparound-padded so slices stay equal.
  * shard_batch assembles the global arrays from per-process local data
    (jax.make_array_from_process_local_data).
  * Checkpoint saves are orbax COLLECTIVES: every process participates
    (ocp sync barriers would deadlock a skipped rank); only process 0 does
    the filesystem bookkeeping (CheckpointManager(primary=...)).  The
    MetricLogger is rank-0-only (plain file writes, no collectives).

Known limitations (multi-host runs only):
  * subsample_points > 0 raises NotImplementedError — the host labeling of
    projected clouds needs the full batch locally; precompute occupancies.
  * Config.visualize should stay off: visualization is rank-0-gated but
    runs collective compute (eval steps, dense sweeps), which would deadlock
    the other ranks.  Visualize from a single-process run of a checkpoint.
"""

from __future__ import annotations

import os

import jax


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-host cluster (call ONCE, before any other jax use).

    Wires `jax.distributed.initialize`.  Returns True when distributed mode
    was initialized.  With no arguments and no explicit coordinator env var
    (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS), this is a no-op returning
    False, so single-host entry points can call it unconditionally.  The gate
    is deliberately explicit-only: TPU metadata vars (TPU_WORKER_HOSTNAMES
    etc.) also exist on single-host TPU boxes and must not trigger cluster
    init after the backend is already up.
    """
    cluster_env = any(
        k in os.environ for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    if coordinator_address is None and num_processes is None and not cluster_env:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log/visualization writes
    (the reference's single process is trivially main)."""
    return jax.process_index() == 0
