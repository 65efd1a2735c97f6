"""End-to-end scene reconstruction pipeline: RGB -> depth -> point cloud ->
voxel occupancy -> IF-Net occupancy logits.

Flax rebuild of the model pipeline inside reference
trainer/trainer_scene_net.py:69-103 (SceneNetTrainer.forward), as one jittable
module.  The training loop around it lives in sv3d_tpu.training.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sv3d_tpu.config import Config
from sv3d_tpu.geometry.camera import Intrinsics
from sv3d_tpu.geometry.frustum import FrustumGrid
from sv3d_tpu.geometry.transforms import depthmap_to_gridspace, norm_grid_space
from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.models.projection import Projection
from sv3d_tpu.models.unet import UNet, UNetMini, renormalize_depth, resize_crop_depth


class SceneNet(nn.Module):
    """Flagship pipeline module.

    __call__ returns (logits, depthmap, point_cloud):
      logits: (B, N_total) occupancy logits at the query points
      depthmap: (B, 240, 320) renormalized predicted depth
      point_cloud: (B, N_pc, 3) projected points in normed grid space
    """

    config: Config
    intrinsics: Intrinsics
    frustum: FrustumGrid
    # optional ("dp", "sp") jax.sharding.Mesh: lets the fused Pallas query
    # path run under shard_map instead of being replicated by GSPMD (see
    # IFNet.query_fused)
    mesh: object = None

    def setup(self):
        cfg = self.config
        # --precision 16 -> bf16 compute (TPU-native mixed precision; params
        # and geometry/voxelization stay float32)
        dt = None if cfg.precision == 32 else cfg.dtype
        if not cfg.skip_unet:
            self.unet = (
                UNet(channels_out=1, dtype=dt)
                if cfg.resize_input
                else UNetMini(channels_out=1, dtype=dt)
            )
        self.project = Projection(cfg.projection())
        self.ifnet = IFNet(cfg.ifnet(), dtype=dt, mesh=self.mesh)

    def predict_depth(self, rgb: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        """(B, H, W, 3) normalized RGB -> (B, 240, 320) renormalized depth
        (reference trainer_scene_net.py:70-80)."""
        cfg = self.config
        logits = self.unet(rgb, train=train).astype(jnp.float32)
        if cfg.resize_input:
            logits = resize_crop_depth(logits)
        return renormalize_depth(logits[..., 0], cfg.min_z, cfg.max_z)

    def project_depth(self, depthmap: jnp.ndarray) -> jnp.ndarray:
        """Depth map -> normed-grid-space point cloud
        (reference trainer_scene_net.py:85-86)."""
        pc = depthmap_to_gridspace(depthmap, self.intrinsics, self.frustum)
        return norm_grid_space(pc, self.config.dims)

    def __call__(
        self,
        rgb: Optional[jnp.ndarray],
        depthmap_target: Optional[jnp.ndarray],
        points: jnp.ndarray,
        train: bool = True,
        subsample_rng: Optional[jax.Array] = None,
    ):
        cfg = self.config
        if cfg.skip_unet:
            depthmap = depthmap_target
        else:
            depthmap = self.predict_depth(rgb, train=train)

        point_cloud = self.project_depth(depthmap)
        voxel_occupancy = self.project(point_cloud)

        n_pixels = depthmap.shape[-2] * depthmap.shape[-1]
        if 0 < cfg.subsample_points < n_pixels:
            # random subset of the projected cloud, concatenated with the
            # sampled supervision points (reference trainer_scene_net.py:91-95)
            if subsample_rng is None:
                raise ValueError("subsample_points > 0 requires subsample_rng")
            idx = jax.random.permutation(subsample_rng, n_pixels)[: cfg.subsample_points]
            pc_sub = point_cloud[:, idx, :]
            query_points = jnp.concatenate([pc_sub, points], axis=1)
            point_cloud_out = pc_sub
        elif cfg.subsample_points == 0:
            query_points = points
            point_cloud_out = point_cloud
        else:
            query_points = jnp.concatenate([point_cloud, points], axis=1)
            point_cloud_out = point_cloud

        logits = self.ifnet(voxel_occupancy, query_points, train=train)
        return logits, depthmap, point_cloud_out
