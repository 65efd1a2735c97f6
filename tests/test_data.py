"""Dataset + loader tests on the prepared fixture tree."""

from pathlib import Path

import numpy as np
import pytest

from sv3d_tpu.data import DataLoader, DepthDataset, ImplicitDataset, SceneNetDataset
from sv3d_tpu.data.loader import collate
from sv3d_tpu.data.splits import read_split, write_split

FIXTURE_DATA = Path(__file__).parent.parent / ".fixture_data"

pytestmark = pytest.mark.skipif(
    not FIXTURE_DATA.exists(),
    reason="run scripts/prepare_overfit.py --out .fixture_data first",
)


def test_scene_net_dataset_sample():
    ds = SceneNetDataset("train", FIXTURE_DATA, num_points=64, splitsdir="overfit")
    # overfit train split is multiplied x50 (reference scene_net_data.py:31)
    assert len(ds) == 50
    s = ds[0]
    assert s["rgb"].shape == (240, 320, 3)
    assert -1.0 <= s["rgb"].min() and s["rgb"].max() <= 1.0
    assert s["points"].shape == (128, 3)  # 64 per sigma x 2 sigmas
    assert s["occupancies"].shape == (128,)
    assert set(np.unique(s["occupancies"])) <= {0.0, 1.0}
    assert s["depthmap_target"].shape == (240, 320)
    assert s["depthmap_target"].min() > 0
    assert s["mesh"].endswith("mesh.obj")


def test_scene_net_dataset_resize():
    ds = SceneNetDataset(
        "train", FIXTURE_DATA, num_points=8, splitsdir="overfit",
        resize_input=True, resize_w=256,
    )
    assert ds[0]["rgb"].shape == (256, 256, 3)


def test_depth_dataset_flips():
    ds = DepthDataset("val", FIXTURE_DATA, "overfit")
    s = ds[0]
    assert s["input"].shape == (240, 320, 3)
    assert s["target"].shape == (240, 320)
    # rgb is L-R flipped and depth column-flipped (reference
    # scenes_dataset.py:58-67): flipped versions must differ from unflipped
    ds2 = SceneNetDataset("val", FIXTURE_DATA, num_points=8, splitsdir="overfit")
    s2 = ds2[0]
    assert not np.allclose(s["input"], s2["rgb"])
    np.testing.assert_allclose(s["input"], s2["rgb"][:, ::-1], atol=1e-6)
    np.testing.assert_allclose(s["target"], s2["depthmap_target"][:, ::-1], atol=1e-6)


def test_implicit_dataset():
    ds = ImplicitDataset("train", FIXTURE_DATA, num_points=32, splitsdir="overfit")
    s = ds[0]
    assert s["input"].shape == (139, 104, 112, 1)
    assert s["input"].sum() == 5466  # golden voxel count
    assert s["points"].shape == (64, 3)
    assert s["occupancies"].shape == (64,)


def test_dataloader_batching():
    ds = SceneNetDataset("train", FIXTURE_DATA, num_points=16, splitsdir="overfit")
    loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True, seed=0)
    assert len(loader) == 12  # 50 // 4
    batches = list(loader)
    assert len(batches) == 12
    b = batches[0]
    assert b["rgb"].shape == (4, 240, 320, 3)
    assert b["points"].shape == (4, 32, 3)
    assert isinstance(b["mesh"], list) and len(b["mesh"]) == 4


def test_dataloader_wraparound_pad_uniform():
    """A partial final batch (drop_last=False) is wraparound-padded to full
    size in EVERY mode, so single- and multi-process runs see the same
    effective epoch and the jitted train step keeps one static batch shape."""

    class _Tiny:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full(2, i, np.float32)}

    single = DataLoader(_Tiny(), batch_size=4, shuffle=False, seed=0)
    batches = list(single)
    assert len(batches) == 3
    assert all(b["x"].shape == (4, 2) for b in batches)
    # final batch: rows 8, 9 then wraparound to 0, 1
    np.testing.assert_array_equal(batches[-1]["x"][:, 0], [8, 9, 0, 1])

    # two-process assembly of the same epoch equals the single-process batches
    shards = [
        list(
            DataLoader(
                _Tiny(), batch_size=4, shuffle=False, seed=0,
                process_index=p, process_count=2,
            )
        )
        for p in range(2)
    ]
    for b, (s0, s1) in enumerate(zip(*shards)):
        np.testing.assert_array_equal(
            np.concatenate([s0["x"], s1["x"]]), batches[b]["x"]
        )


def test_dataloader_workers_and_prefetch():
    ds = ImplicitDataset("train", FIXTURE_DATA, num_points=8, splitsdir="overfit")
    loader = DataLoader(ds, batch_size=8, num_workers=2, prefetch=2)
    n = sum(1 for _ in loader)
    assert n == len(loader)


def test_collate_mixed_types():
    out = collate([
        {"a": np.zeros(3), "n": "x"},
        {"a": np.ones(3), "n": "y"},
    ])
    assert out["a"].shape == (2, 3)
    assert out["n"] == ["x", "y"]


def test_split_roundtrip(tmp_path):
    write_split(tmp_path, "s", "train", ["00000", "00001"])
    assert read_split(tmp_path, "s", "train") == ["00000", "00001"]


def test_dataset_rng_thread_safe_deterministic():
    """Point subsampling is seeded per (seed, epoch, idx): identical batches
    for any num_workers, fresh draws each epoch, no shared-Generator races."""

    def collect(num_workers):
        ds = SceneNetDataset(
            "train", FIXTURE_DATA, num_points=16, splitsdir="overfit", seed=7
        )
        loader = DataLoader(
            ds, batch_size=4, shuffle=False, num_workers=num_workers, seed=7
        )
        return [
            np.concatenate([b["points"].ravel() for b in loader]) for _ in range(2)
        ]

    serial = collect(0)
    threaded = collect(4)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)
    # epochs draw different subsamples
    assert not np.array_equal(serial[0], serial[1])
    # different dataset indices of the same repeated item differ too
    ds = SceneNetDataset(
        "train", FIXTURE_DATA, num_points=16, splitsdir="overfit", seed=7
    )
    assert not np.array_equal(ds[0]["points"], ds[1]["points"])


def test_scene_net_dataset_flip_aug():
    """With flip_x_about set, ~half of accesses return the column-reversed
    rgb/depth and points mirrored as p0 -> A - p0, with occupancy labels and
    the per-access subsample unchanged (the flip draw follows the subsample
    draw in the same rng stream)."""
    A = -0.00628
    base = SceneNetDataset("train", FIXTURE_DATA, num_points=16, splitsdir="overfit")
    ds = SceneNetDataset(
        "train", FIXTURE_DATA, num_points=16, splitsdir="overfit", flip_x_about=A
    )
    n_flipped = 0
    for epoch in range(8):
        for idx in range(4):
            ref, s = base.get(idx, epoch), ds.get(idx, epoch)
            np.testing.assert_array_equal(s["occupancies"], ref["occupancies"])
            if np.array_equal(s["rgb"], ref["rgb"]):
                np.testing.assert_array_equal(s["points"], ref["points"])
                np.testing.assert_array_equal(
                    s["depthmap_target"], ref["depthmap_target"]
                )
                continue
            n_flipped += 1
            np.testing.assert_array_equal(s["rgb"], ref["rgb"][:, ::-1])
            np.testing.assert_array_equal(
                s["depthmap_target"], ref["depthmap_target"][:, ::-1]
            )
            np.testing.assert_allclose(
                s["points"][:, 0], A - ref["points"][:, 0], atol=1e-6
            )
            np.testing.assert_array_equal(s["points"][:, 1:], ref["points"][:, 1:])
    assert 4 <= n_flipped <= 28  # ~Binomial(32, 0.5); bounds are ~5 sigma


def test_trainer_flip_x_about_matches_geometry():
    """SceneNetTrainer computes the dataset's mirror constant from its own
    FrustumGrid, and rejects intrinsics whose principal point breaks the
    exact-mirror precondition (cx must be (W-1)/2)."""
    import dataclasses

    import pytest as _pytest

    from sv3d_tpu.config import Config
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(datasetdir=str(FIXTURE_DATA), splitsdir="overfit",
                 flip_aug=True, num_points=8)
    tr = SceneNetTrainer.__new__(SceneNetTrainer)  # geometry only, no state
    tr.config = cfg
    from sv3d_tpu.geometry import FrustumGrid, read_intrinsics

    intr = read_intrinsics(FIXTURE_DATA / "intrinsics.txt")
    tr.intrinsics = intr
    tr.frustum = FrustumGrid.create(intr, voxel_size=0.05 * cfg.scale_factor)
    A = tr._flip_x_about()
    assert A == _pytest.approx(
        2.0 * tr.frustum.camera2frustum[0][3] / cfg.dims[0] - 1.0
    )
    # an off-center principal point (e.g. cx = W/2 = 160.0) would silently
    # misalign mirrored labels — must raise, not train wrong
    from sv3d_tpu.geometry.camera import Intrinsics

    m = [list(r) for r in intr.matrix]
    m[0][2] = 160.0
    tr.intrinsics = Intrinsics(tuple(tuple(r) for r in m))
    with _pytest.raises(ValueError, match="cx"):
        tr._flip_x_about()
    tr.intrinsics = intr
    tr.config = dataclasses.replace(cfg, flip_aug=False)
    assert tr._flip_x_about() is None
