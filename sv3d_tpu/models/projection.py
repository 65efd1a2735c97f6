"""Differentiable depth->voxel-occupancy projection module.

Flax rebuild of reference model/projection.py:21-122 ("project"): voxelizes a
point cloud (trilinear scatter) and smooths it with a separable Gaussian whose
per-axis sigma is a LEARNABLE parameter (reference model/projection.py:26-27;
the end-to-end trainer gives it a 10x learning rate,
trainer/trainer_scene_net.py:48).

The depth->point-cloud back-projection itself is stateless geometry and lives
in sv3d_tpu.geometry.transforms; this module owns only the learnable part.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sv3d_tpu.config import ProjectionConfig
from sv3d_tpu.ops.voxelize import gaussian_kernels_1d, scatter_voxels, smooth_voxels


class Projection(nn.Module):
    config: ProjectionConfig = ProjectionConfig()
    #: None = auto (Pallas scatter kernel on TPU, XLA scatter elsewhere).
    #: The fused kernel (ops/pallas/voxelize.py) is f32-exact and ~an order
    #: of magnitude faster than XLA's per-index scatter on the 76,800-point
    #: back-projection; it also avoids the scatter's large HBM temps.
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, point_cloud: jnp.ndarray) -> jnp.ndarray:
        """point_cloud: (B, N, 3) in normed grid space [-0.5, 0.5] ->
        (B, D0, D1, D2, 1) smoothed occupancy grid in [0, 1]."""
        cfg = self.config
        sigma = self.param(
            "sigma",
            lambda _key: jnp.asarray(cfg.init_sigma, dtype=jnp.float32),
        )
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from sv3d_tpu.ops.pallas.voxelize import scatter_voxels_pallas

            vox = scatter_voxels_pallas(point_cloud, cfg.dims)
        else:
            vox = scatter_voxels(point_cloud, cfg.dims)
        smoothed = smooth_voxels(
            vox, gaussian_kernels_1d(sigma, cfg.kernel_size)
        )
        return smoothed[..., None]
