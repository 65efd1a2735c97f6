"""Data staging: collect per-view render outputs from a BlenderProc-style tree
into data/raw/<splitsdir>/<scene>/<view>/ (reference
data_processing/copy_data.py:44-58)."""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

VIEW_FILES = ("rgb.png", "campose.npy", "distance.exr", "distance_field.df")


def copy_data(src_root: str | Path, dst_root: str | Path, splitsdir: str):
    src_root, dst = Path(src_root), Path(dst_root) / "raw" / splitsdir
    copied = []
    for scene in sorted(p for p in src_root.iterdir() if p.is_dir()):
        for view in sorted(p for p in scene.iterdir() if p.is_dir()):
            out = dst / scene.name / view.name
            files = [view / f for f in VIEW_FILES]
            if not all(f.exists() for f in files):
                continue
            out.mkdir(parents=True, exist_ok=True)
            for f in files:
                shutil.copyfile(f, out / f.name)
            copied.append(str(out))
    return copied


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--datasetdir", default="data")
    p.add_argument("--splitsdir", required=True)
    a = p.parse_args()
    print(f"copied {len(copy_data(a.src, a.datasetdir, a.splitsdir))} views")
