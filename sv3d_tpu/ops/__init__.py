from sv3d_tpu.ops.grid_sample import sample_trilinear
from sv3d_tpu.ops.voxelize import gaussian_kernels_1d, scatter_voxels, smooth_voxels, voxelize

__all__ = [
    "sample_trilinear",
    "scatter_voxels",
    "smooth_voxels",
    "voxelize",
    "gaussian_kernels_1d",
]
