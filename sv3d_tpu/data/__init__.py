"""Host-side data layer: datasets, batching loader, split files."""

from sv3d_tpu.data.datasets import DepthDataset, ImplicitDataset, SceneNetDataset
from sv3d_tpu.data.loader import DataLoader, collate
from sv3d_tpu.data.splits import read_split, split_path, write_split

__all__ = [
    "DataLoader",
    "DepthDataset",
    "ImplicitDataset",
    "SceneNetDataset",
    "collate",
    "read_split",
    "split_path",
    "write_split",
]
