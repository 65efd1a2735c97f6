"""Split file creation (reference data_processing/create_split.py and
create_split_scenenet.py): percentage-based train/val/test splits, either from
zero-padded sample ids or from a scene/view directory tree with shuffle +
subsample."""

from __future__ import annotations

import argparse
import random
from pathlib import Path

from sv3d_tpu.data.splits import write_split


def create_split_from_count(
    datasetdir: str | Path,
    splitsdir: str,
    n_samples: int,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    pad: int = 5,
):
    ids = [str(i).zfill(pad) for i in range(n_samples)]
    n_train = int(n_samples * train_frac)
    n_val = int(n_samples * val_frac)
    write_split(datasetdir, splitsdir, "train", ids[:n_train])
    write_split(datasetdir, splitsdir, "val", ids[n_train : n_train + n_val])
    write_split(datasetdir, splitsdir, "test", ids[n_train + n_val :])
    # visualization subsets used by validation dumps
    write_split(datasetdir, splitsdir, "train_vis", ids[: min(4, n_train)])
    write_split(datasetdir, splitsdir, "val_vis", ids[n_train : n_train + min(4, n_val)])


def create_split_from_tree(
    datasetdir: str | Path,
    rawdir: str | Path,
    splitsdir: str,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    subsample: int | None = None,
    seed: int = 0,
):
    """Walk rawdir/<scene>/<view> and emit 'scene/view' split entries
    (reference create_split_scenenet.py:35-58)."""
    root = Path(rawdir)
    items = sorted(
        f"{scene.name}/{view.name}"
        for scene in root.iterdir() if scene.is_dir()
        for view in scene.iterdir() if view.is_dir()
    )
    rng = random.Random(seed)
    rng.shuffle(items)
    if subsample:
        items = items[:subsample]
    n = len(items)
    n_train, n_val = int(n * train_frac), int(n * val_frac)
    write_split(datasetdir, splitsdir, "train", items[:n_train])
    write_split(datasetdir, splitsdir, "val", items[n_train : n_train + n_val])
    write_split(datasetdir, splitsdir, "test", items[n_train + n_val :])
    return items


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--datasetdir", default="data")
    p.add_argument("--rawdir", default=None)
    p.add_argument("--splitsdir", required=True)
    p.add_argument("--n_samples", type=int, default=None)
    p.add_argument("--train_frac", type=float, default=0.8)
    p.add_argument("--val_frac", type=float, default=0.1)
    p.add_argument("--subsample", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    if a.rawdir:
        create_split_from_tree(
            a.datasetdir, a.rawdir, a.splitsdir, a.train_frac, a.val_frac,
            a.subsample, a.seed,
        )
    else:
        assert a.n_samples is not None, "--n_samples or --rawdir required"
        create_split_from_count(a.datasetdir, a.splitsdir, a.n_samples, a.train_frac, a.val_frac)
