from sv3d_tpu.io.exr import read_exr, read_exr_channel, write_exr
from sv3d_tpu.io.image import load_rgb, normalize_rgb, square_pad_resize
from sv3d_tpu.io.mesh import TriMesh, load_obj, save_obj
from sv3d_tpu.io.volume import read_df, read_semantics, down_sample, write_df

__all__ = [
    "read_exr",
    "read_exr_channel",
    "write_exr",
    "load_rgb",
    "normalize_rgb",
    "square_pad_resize",
    "TriMesh",
    "load_obj",
    "save_obj",
    "read_df",
    "read_semantics",
    "down_sample",
    "write_df",
]
