"""Device meshes and sharding rules.

The reference has no multi-device parallelism at all (SURVEY.md §2: every
trainer pins one GPU).  sv3d_tpu scales through a 2-D jax.sharding.Mesh:

  * axis "dp" — data parallel: the batch dimension of every array in a train
    batch is sharded over dp; parameters/optimizer state are replicated and
    XLA inserts psum gradient all-reduces over ICI.
  * axis "sp" — point parallel: the query-point dimension of dense-grid
    inference sweeps is sharded over sp (the framework's analog of sequence
    parallelism; SURVEY.md §5 "long-context").  The conv feature pyramid is
    replicated across sp while each shard evaluates its own point tile.

Collectives are all emitted by XLA from sharding annotations — there is no
hand-written communication layer to maintain (the TPU-native answer to the
reference's absent NCCL/DDP).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, sp: int = 1, devices=None) -> Mesh:
    """Create a (dp, sp) mesh over the first dp*sp available devices."""
    devices = jax.devices() if devices is None else devices
    n = dp * sp
    if len(devices) < n:
        raise ValueError(f"need {n} devices for dp={dp} sp={sp}, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension sharded over dp, rest replicated."""
    return NamedSharding(mesh, P("dp"))


def point_sharding(mesh: Mesh, axis: int = 1) -> NamedSharding:
    """Query-point dimension sharded over sp (axis 1 of (B, N, ...) arrays)."""
    spec = [None] * (axis + 1)
    spec[0] = "dp"
    spec[axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# batch keys whose axis 1 is the query-point dimension (B, N, ...) — these
# shard over sp in addition to dp (see module docstring)
POINT_KEYS = ("points", "occupancies")


def shard_batch(batch: dict, mesh: Mesh, point_keys=POINT_KEYS) -> dict:
    """device_put every array in a batch dict with the batch dim over dp and
    the query-point dim of point arrays additionally over sp; non-arrays
    (names, mesh paths) pass through on host.

    Requires batch_size % dp == 0 and, for point arrays, points-per-sample %
    sp == 0 (2*num_points is even, so any power-of-two sp works)."""
    sh = batch_sharding(mesh)
    psh = point_sharding(mesh)
    multihost = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            s = psh if k in point_keys and v.ndim >= 2 else sh
            if multihost:
                # v is this process's local slice of the global batch (the
                # DataLoader's process_index slicing); assemble the global
                # array without any cross-host transfer
                out[k] = jax.make_array_from_process_local_data(s, np.asarray(v))
            else:
                out[k] = jax.device_put(v, s)
        else:
            out[k] = v
    return out


def local_batch_rows(arr: jax.Array, mesh: Mesh) -> np.ndarray:
    """THIS process's rows (leading batch axis) of a global array, as numpy,
    in global-index order — the inverse of the shard_batch assembly for the
    loader's per-process batch slice, enabling host-side per-process work
    (e.g. occupancy labeling) on globally sharded data without cross-host
    transfers.

    The array is first resharded to batch-only sharding (every row whole on
    one device) so addressable shards are whole rows; a (dp, sp)-sharded
    input would otherwise yield row FRAGMENTS.  Row order matches the local
    DataLoader order because make_array_from_process_local_data packs local
    rows into the process's addressable shards in global-index order."""
    arr = jax.jit(lambda x: x, out_shardings=batch_sharding(mesh))(arr)
    parts = {}
    for s in arr.addressable_shards:  # dedupe sp-replicated row copies
        start = s.index[0].start or 0
        if start not in parts:
            parts[start] = np.asarray(s.data)
    return np.concatenate([parts[k] for k in sorted(parts)], axis=0)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / train state) over the whole mesh.  In
    multi-host mode every process holds identical host-side values (same seed
    or same restored checkpoint), so the global replicated arrays are
    assembled from process-local data."""
    sh = replicate(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), tree
        )
    return jax.device_put(tree, sh)
