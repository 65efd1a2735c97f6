from sv3d_tpu.geometry.camera import (
    Intrinsics,
    distance_to_depth,
    depth_to_camera,
    parse_intrinsics,
    read_intrinsics,
)
from sv3d_tpu.geometry.frustum import (
    FrustumGrid,
    generate_frustum,
    generate_frustum_volume,
)
from sv3d_tpu.geometry.transforms import (
    depthmap_to_gridspace,
    make_3d_grid,
    norm_grid_space,
    unnorm_grid_space,
)

__all__ = [
    "Intrinsics",
    "distance_to_depth",
    "depth_to_camera",
    "parse_intrinsics",
    "read_intrinsics",
    "FrustumGrid",
    "generate_frustum",
    "generate_frustum_volume",
    "depthmap_to_gridspace",
    "make_3d_grid",
    "norm_grid_space",
    "unnorm_grid_space",
]
