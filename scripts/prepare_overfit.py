"""Prepare a training-ready data tree from the reference's raw overfit fixture.

Builds <out>/raw/overfit/00000, <out>/processed/overfit/00000,
<out>/splits/overfit/*, and <out>/intrinsics.txt using sv3d_tpu's own
preprocessing (depth grid + waterproofed occupancy samples).  The raw fixture
ships a ready-made mesh.obj but no distance_field.df, so the df->mesh step is
skipped when the mesh already exists.

Usage: python scripts/prepare_overfit.py [--src /root/reference/data] [--out data]
       [--num_samples 100000]
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def prepare(src: Path, out: Path, num_samples: int = 100000, seed: int = 0) -> Path:
    from sv3d_tpu.preprocessing.occupancies import sample_points
    from sv3d_tpu.preprocessing.process_sample import depth_grid_from_distance

    sample_src = src / "raw" / "overfit" / "00000"
    raw = out / "raw" / "overfit" / "00000"
    processed = out / "processed" / "overfit" / "00000"
    raw.mkdir(parents=True, exist_ok=True)
    processed.mkdir(parents=True, exist_ok=True)

    for f in sample_src.iterdir():
        dst = raw / f.name
        if not dst.exists():
            shutil.copyfile(f, dst)
    shutil.copyfile(src / "intrinsics.txt", out / "intrinsics.txt")

    splits = out / "splits" / "overfit"
    splits.mkdir(parents=True, exist_ok=True)
    for split in ("train", "val", "train_eval", "train_vis", "val_vis"):
        (splits / f"{split}.txt").write_text("00000\n")
    (splits / "test.txt").write_text("00000\n")

    dims = (139, 104, 112)
    if not (processed / "depth_grid.npz").exists():
        _, grid, gdims = depth_grid_from_distance(
            raw / "distance.exr", raw / "intrinsic.txt"
        )
        assert tuple(gdims) == dims
        np.savez_compressed(processed / "depth_grid", grid=grid)

    rng = np.random.default_rng(seed)
    for sigma in (0.01, 0.1):
        path = processed / f"occupancy_{sigma:.02f}.npz"
        if path.exists():
            continue
        pts, occ, grid_coords = sample_points(
            raw / "mesh.obj", dims, num_samples, sigma, rng=rng
        )
        np.savez(
            processed / f"occupancy_{sigma:.02f}",
            points=pts, occupancies=occ, grid_coords=grid_coords,
        )
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/reference/data")
    p.add_argument("--out", default="data")
    p.add_argument("--num_samples", type=int, default=100000)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    out = prepare(Path(a.src), Path(a.out), a.num_samples, a.seed)
    print(f"prepared {out}")
