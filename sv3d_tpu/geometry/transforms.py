"""Grid-space coordinate transforms (pure jnp, jittable).

Canonical coordinate convention used throughout sv3d_tpu:

* "grid space": continuous voxel-index coordinates in [0, dims[i]] along grid
  axis i (axis 0 = frustum x / 139, axis 1 = frustum y / 104, axis 2 = depth
  z / 112 at full scale).
* "normed grid space": grid space centered and scaled to [-0.5, 0.5]^3 per
  axis (reference model/projection.py:124-148).
* Point coordinate order ALWAYS equals grid axis order: points[..., i]
  addresses grid axis i.  The reference needs an axis swap + x2 before torch
  grid_sample (model/ifnet.py:94-95, data_processing/mesh_occupancies.py:19-20)
  only because torch indexes grids in reversed (W,H,D) order; our sampler
  (sv3d_tpu.ops.grid_sample) indexes axes directly, so no swap exists anywhere.
"""

from __future__ import annotations

import jax.numpy as jnp

from sv3d_tpu.geometry.camera import Intrinsics, depth_to_camera
from sv3d_tpu.geometry.frustum import FrustumGrid


def depthmap_to_gridspace(
    depthmap: jnp.ndarray, intrinsics: Intrinsics, grid: FrustumGrid
) -> jnp.ndarray:
    """Back-project depth maps into frustum-grid-space points.

    depthmap: (B, H, W) -> (B, H*W, 3) points in grid space.
    Matches reference model/projection.py:150-163.
    """
    pts = depth_to_camera(depthmap, intrinsics.focal_length, intrinsics.cx, intrinsics.cy)
    # The camera->frustum transform is axis-aligned scale+shift
    # (reference model/projection.py:193-196); apply it elementwise on the VPU
    # rather than as a matmul so float32 rounding is exact on TPU (the MXU
    # would otherwise downcast operands to bf16 at default precision).
    c2f = grid.matrix
    scale = jnp.asarray([c2f[0, 0], c2f[1, 1], c2f[2, 2]], dtype=depthmap.dtype)
    shift = jnp.asarray(c2f[:3, 3], dtype=depthmap.dtype)
    return pts * scale + shift


def norm_grid_space(pc: jnp.ndarray, dims) -> jnp.ndarray:
    """Grid space -> [-0.5, 0.5]^3 (reference model/projection.py:124-132)."""
    d = jnp.asarray(dims, dtype=pc.dtype)
    return (pc - d / 2.0) / d


def unnorm_grid_space(pc: jnp.ndarray, dims) -> jnp.ndarray:
    """[-0.5, 0.5]^3 -> grid space (reference model/projection.py:134-148)."""
    d = jnp.asarray(dims, dtype=pc.dtype)
    return pc * d + d / 2.0


def make_3d_grid(bb_min, bb_max, shape, res_increase: int = 1) -> jnp.ndarray:
    """Dense lattice of query points over a bounding box.

    Returns (prod(shape)*res_increase^3, 3) points where coordinate i is
    linspace(bb_min[i], bb_max[i], shape[i]*res_increase), ordered row-major
    over (axis0, axis1, axis2).  Matches reference model/ifnet.py:202-212.
    """
    axes = [
        jnp.linspace(bb_min[i], bb_max[i], int(shape[i]) * res_increase)
        for i in range(3)
    ]
    g0, g1, g2 = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([g0.ravel(), g1.ravel(), g2.ravel()], axis=1)
