"""Dense-grid occupancy evaluation + mesh extraction.

The reference evaluates its network on a dense query lattice by re-running the
ENTIRE conv feature pyramid for every point chunk (reference
model/ifnet.py:215-229 — network(x, pi) per chunk).  Here the pyramid is
encoded ONCE, and the dense sweep runs through IFNet.query_lattice — the
separable-resize formulation (sv3d_tpu/ops/lattice.py) that replaces per-point
gathers with banded matmuls on the MXU.  The lattice is processed in
fixed-shape row slabs so XLA compiles exactly one program for the whole sweep
and peak memory stays bounded.

evaluate_points() keeps the gather-based path for arbitrary (non-lattice)
query sets, with optional sharding of the point dimension over the mesh's
"sp" axis.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sv3d_tpu.models.ifnet import IFNet


# jitted-program caches keyed on (model, static shape params): building a jit
# inside a helper would otherwise recompile on every call
@lru_cache(maxsize=64)
def _encode_fn(model: IFNet):
    return jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))


@lru_cache(maxsize=64)
def _lattice_sweep_fn(model: IFNet, resolution, res_increase, slab_rows, n_slabs):
    res = tuple(int(x) * res_increase for x in resolution)

    @jax.jit
    def sweep(v, lv):
        def body(off):
            return jax.nn.sigmoid(
                model.apply(
                    v, lv, resolution, res_increase, slab_rows, off,
                    method=IFNet.query_lattice,
                )
            )[0]

        offs = jnp.arange(n_slabs, dtype=jnp.int32) * slab_rows
        slabs = jax.lax.map(body, offs)  # (n_slabs, slab_rows, r1, r2)
        return slabs.reshape(n_slabs * slab_rows, res[1], res[2])

    return sweep


@lru_cache(maxsize=64)
def _lattice_sweep_sharded_fn(
    model: IFNet, resolution, res_increase, slab_rows, slabs_per_shard, mesh
):
    """Sp-sharded dense sweep: lattice rows (axis 0) are partitioned over the
    mesh's "sp" axis, the feature pyramid and params are replicated, and each
    shard runs its own lax.map over its contiguous block of row slabs.  The
    TPU-native replacement for the reference's single-GPU chunked loop
    (reference model/ifnet.py:215-229); all communication is the implicit
    replication broadcast — shards write disjoint output rows."""
    res = tuple(int(x) * res_increase for x in resolution)
    from jax.sharding import PartitionSpec as P

    def shard_body(v, lv):
        base = jax.lax.axis_index("sp") * (slabs_per_shard * slab_rows)

        def body(off):
            return jax.nn.sigmoid(
                model.apply(
                    v, lv, resolution, res_increase, slab_rows, base + off,
                    method=IFNet.query_lattice,
                )
            )[0]

        offs = jnp.arange(slabs_per_shard, dtype=jnp.int32) * slab_rows
        slabs = jax.lax.map(body, offs)
        return slabs.reshape(slabs_per_shard * slab_rows, res[1], res[2])

    fn = jax.shard_map(
        shard_body, mesh=mesh, in_specs=(P(), P()), out_specs=P("sp")
    )
    return jax.jit(fn)


@lru_cache(maxsize=64)
def _points_sweep_fn(model: IFNet, use_pallas: bool, mesh, bands=None):
    """All query tiles in ONE jitted program: pts (n_tiles, 1, tile, 3) ->
    (n_tiles, tile) sigmoid occupancy via lax.map over tiles.  The r1 version
    round-tripped the host per tile (numpy staging + result transfer), which
    measured 1.2M points/s against the kernel's own 2.7M (BENCH_r02) — the
    loop now lives on device and the API pays ONE transfer each way.

    With a mesh each tile's points are sharded over ALL devices (dp and sp
    flattened) and the fused kernel runs per-shard under shard_map."""
    if use_pallas:
        body = lambda v, lv, p: jax.nn.sigmoid(
            model.apply(
                v, lv, p, mesh="local", bands=bands, method=IFNet.query_fused
            )
        )
    else:
        body = lambda v, lv, p: jax.nn.sigmoid(
            model.apply(v, lv, p, method=IFNet.query)
        )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        body = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(), P(None, ("dp", "sp"))),
            out_specs=P(None, ("dp", "sp")),
            check_vma=False,
        )

    @jax.jit
    def sweep(v, lv, pts):
        return jax.lax.map(lambda p: body(v, lv, p)[0], pts)

    return sweep


def evaluate_on_grid(
    model: IFNet,
    variables: dict,
    grid: jnp.ndarray,
    resolution,
    res_increase: int = 1,
    slab_rows: int = 1,
    mesh=None,
    transfer_dtype=jnp.float32,
) -> np.ndarray:
    """Evaluate sigmoid-occupancy on the dense lattice over [-0.5, 0.5]^3.

    slab_rows default = 1: the finest slab tiling measured FASTEST on the
    v5e (2026-08-21, interleaved A/B x3: rows=1 119.3-119.9M pts/s vs
    rows=2 95.6M, bit-identical output) — the per-slab program stays
    MXU-resident and the rolled lax.map carries no per-iteration overhead
    worth amortizing.  Per-rows timing is chip-window-dependent (rows=8
    swung 102.7->83.6M across days while rows=2 held ~92M), so bench.py
    autotunes over {1, 2, 4, 8} per run and serving deployments should too.

    grid: (1, D0, D1, D2, 1) input occupancy volume.
    Returns (r0, r1, r2) float32 numpy volume with r_i = resolution[i] *
    res_increase (reference evaluate_network_on_grid, model/ifnet.py:215-229).

    With a mesh, lattice rows are sharded over its "sp" axis (pyramid
    replicated) — the point-sharded inference path.

    transfer_dtype: the value grid is cast on DEVICE before the host pull.
    Default float32 = exact (the contract metric evals rely on).  Pass
    jnp.float16 at latency-sensitive call sites: the 12.95M-cell full-scale
    grid is 52 MB in f32 and the device->host transfer dominates warm
    image->mesh latency (measured 3.8 s through this environment's tunneled
    chip; halved bytes help real PCIe hosts too).  float16 resolves the
    sigmoid field to ~5e-4, i.e. marching-cubes vertex shifts of <1e-3 voxel
    at the 0.5 level.  jnp.uint8 quarters the f32 bytes (fixed-point x/255,
    field error <=2e-3 -> vertex shifts still <0.01 voxel); the returned
    array is always float32 in [0, 1] regardless.  None skips the cast.
    """
    resolution = tuple(int(x) for x in resolution)
    res = tuple(x * res_increase for x in resolution)

    if transfer_dtype == jnp.uint8:
        host = _evaluate_u8(
            model, variables, grid, resolution, res_increase, slab_rows, mesh
        )
        return host.astype(np.float32) / np.float32(255.0)
    levels = _encode_fn(model)(variables, grid)
    out = evaluate_on_grid_device(
        model, variables, levels, resolution, res_increase, slab_rows, mesh
    )
    if transfer_dtype is not None:
        out = out.astype(transfer_dtype)
    return np.asarray(out[: res[0]]).astype(np.float32)


def _evaluate_u8(model, variables, grid, resolution, res_increase, slab_rows,
                 mesh) -> np.ndarray:
    """Dense sweep -> ON-DEVICE uint8 fixed-point cast (x/255) -> host pull.
    The raw u8 array (quarter the f32 bytes) is what crosses the wire; the
    serving path (implicit_to_mesh) meshes it directly via the native u8
    marching cubes, metric evals re-expand to f32."""
    res0 = int(resolution[0]) * res_increase
    levels = _encode_fn(model)(variables, grid)
    out = evaluate_on_grid_device(
        model, variables, levels, resolution, res_increase, slab_rows, mesh
    )
    return np.asarray((out[:res0] * 255.0 + 0.5).astype(jnp.uint8))


def evaluate_on_grid_device(
    model: IFNet,
    variables: dict,
    levels,
    resolution,
    res_increase: int = 1,
    slab_rows: int = 1,
    mesh=None,
) -> jnp.ndarray:
    """Whole dense sweep as ONE jitted program (lax.map over row slabs),
    result stays on device: (r0_padded, r1, r2) sigmoid occupancy.  Used by
    benchmarking and by callers that post-process on device.

    With a mesh, the row axis is sharded over "sp" (see
    _lattice_sweep_sharded_fn); rows beyond resolution[0]*res_increase are
    padding and must be trimmed by the caller."""
    resolution = tuple(int(x) for x in resolution)
    res = tuple(x * res_increase for x in resolution)
    n_slabs = -(-res[0] // slab_rows)
    if mesh is not None:
        sp = mesh.shape["sp"]
        slabs_per_shard = -(-n_slabs // sp)
        sweep = _lattice_sweep_sharded_fn(
            model, resolution, res_increase, slab_rows, slabs_per_shard, mesh
        )
    else:
        sweep = _lattice_sweep_fn(model, resolution, res_increase, slab_rows, n_slabs)
    return sweep(variables, levels)


def evaluate_points(
    model: IFNet,
    variables: dict,
    grid: jnp.ndarray,
    points: np.ndarray,
    tile_points: int = 65536,
    mesh=None,
    use_pallas: bool | None = None,
    bands: int | None | str = "auto",
) -> np.ndarray:
    """Sigmoid-occupancy at ARBITRARY points (M, 3) in [-0.5, 0.5], tiled at
    a fixed shape; points may be sharded over "sp".

    use_pallas (default: auto — True on TPU, with or without a mesh) routes
    through the MXU-fused bucketed interpolation kernel (IFNet.query_fused)
    instead of XLA gathers; bf16 compute, inference-grade (~1e-2 relative
    logit tolerance — opt out with use_pallas=False for exact f32 gathers).
    bands opts the fused path into 2-D (slab, band) bucketing — fewer issued
    matmul FLOPs at full dims, hardware-confirmed faster (BENCH_r03: 3.15M
    vs 2.64M pts/s at 262k full-dims queries; ARCHITECTURE.md §9).  The
    DEFAULT is "auto": pick the band count minimizing the static issued-FLOP
    model for this grid and query count (ops/pallas/cost.py choose_bands;
    e.g. at 262k queries: 8 at full IF-Net-128 dims, 4 at half scale).  Pass
    bands=None for the 1-D slab path (also the only differentiable one —
    inference-only here, so the banded default is safe).

    With a mesh the point axis is sharded over ALL its devices (dp and sp
    flattened) and the fused kernel runs per-shard under shard_map."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    levels = _encode_fn(model)(variables, grid)
    n_shards = mesh.shape["dp"] * mesh.shape["sp"] if mesh is not None else 1

    pts = np.asarray(points, dtype=np.float32)
    m = pts.shape[0]
    tile = min(tile_points, m)
    tile = max((tile // n_shards) * n_shards, n_shards)
    if bands == "auto":
        from sv3d_tpu.ops.pallas.cost import choose_bands

        # the kernel counting-buckets ONE tile per call (per shard), so that
        # is the population the pad-amplification model must see: more bands
        # cut the pencil K but pad more of each 128-slot compute tile as
        # points-per-bucket drops
        bands = (
            choose_bands(
                model.config, tuple(int(s) for s in grid.shape[1:4]),
                n=max(tile // n_shards, 1),
            )
            if use_pallas else None
        )
    n_tiles = -(-m // tile)
    padded = np.zeros((n_tiles, 1, tile, 3), dtype=np.float32)
    padded.reshape(-1, 3)[:m] = pts

    if mesh is not None:
        from sv3d_tpu.parallel.mesh import replicate

        levels = jax.device_put(levels, replicate(mesh))

    sweep = _points_sweep_fn(model, use_pallas, mesh, bands if use_pallas else None)
    out = np.asarray(sweep(variables, levels, jnp.asarray(padded)))
    return out.reshape(-1)[:m]


def implicit_to_mesh(
    model: IFNet,
    variables: dict,
    grid: jnp.ndarray,
    resolution,
    threshold_p: float,
    output_path: str | Path,
    res_increase: int = 1,
    slab_rows: int = 1,
    mesh=None,
    transfer_dtype=jnp.uint8,
):
    """Dense evaluation -> marching cubes on (1 - occupancy) at level
    threshold_p -> OBJ (reference model/ifnet.py:232-234).

    This is the latency-sensitive serving path, so the device->host pull of
    the value grid defaults to uint8 fixed-point: the A/B on the tunneled
    v5e chip (scripts/measure_step.py --set serving, 2026-08-19) measured
    the r_inc=2 sweep+pull at 1567 ms (f32) / 1372 ms (f16) / 564 ms (u8) —
    the pull dominates, and quartering the bytes wins 2.8x.  u8 quantizes
    the sigmoid field by <=2e-3 -> marching-cubes vertex shifts <0.01 voxel
    at the 0.5 level (see evaluate_on_grid); pass transfer_dtype=jnp.float32
    for exact (the contract metric evals use).  The u8 grid is meshed
    directly by the native u8 marching cubes (same mesh to float rounding;
    skips two full-grid f32 host passes — cast and the 1-v temporary)."""
    if transfer_dtype == jnp.uint8:
        from sv3d_tpu.utils.visualize import visualize_sdf_u8

        resolution = tuple(int(x) for x in resolution)
        host_u8 = _evaluate_u8(
            model, variables, grid, resolution, res_increase, slab_rows, mesh
        )
        return visualize_sdf_u8(host_u8, output_path, level=threshold_p)
    value_grid = evaluate_on_grid(
        model, variables, grid, resolution, res_increase, slab_rows, mesh,
        transfer_dtype=transfer_dtype,
    )
    from sv3d_tpu.utils.visualize import visualize_sdf

    return visualize_sdf(1.0 - value_grid, output_path, level=threshold_p)
