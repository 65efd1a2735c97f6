"""Tests for data staging (preprocessing/copy_data.py) and eval-space mesh
normalization (preprocessing/scaled_obj.py) — the two offline tools that had
no direct coverage (reference data_processing/copy_data.py:44-58 and
convert_to_scaled_obj.py:38-47)."""

from pathlib import Path

import numpy as np

from sv3d_tpu.io.mesh import TriMesh, load_obj
from sv3d_tpu.preprocessing.copy_data import VIEW_FILES, copy_data
from sv3d_tpu.preprocessing.scaled_obj import convert_to_scaled_obj, convert_tree


def _make_view(root: Path, scene: str, view: str, files=VIEW_FILES):
    d = root / scene / view
    d.mkdir(parents=True)
    for f in files:
        (d / f).write_bytes(b"x" * 8)


def test_copy_data_stages_complete_views_only(tmp_path):
    src = tmp_path / "blenderproc"
    _make_view(src, "scene_a", "00000")
    _make_view(src, "scene_a", "00001", files=VIEW_FILES[:2])  # incomplete
    _make_view(src, "scene_b", "00000")
    (src / "not_a_scene.txt").write_text("ignored")

    copied = copy_data(src, tmp_path / "data", "synth")
    assert len(copied) == 2
    dst = tmp_path / "data" / "raw" / "synth"
    assert (dst / "scene_a" / "00000" / "distance.exr").exists()
    assert (dst / "scene_b" / "00000" / "rgb.png").exists()
    # the incomplete view was skipped entirely, not partially staged
    assert not (dst / "scene_a" / "00001").exists()


def _box_obj(path: Path, lo, hi):
    lo, hi = np.asarray(lo, float), np.asarray(hi, float)
    corners = np.array(
        [[x, y, z] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])]
    )
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 6, 5], [5, 6, 7]])
    TriMesh(corners, faces).export(path)


def test_convert_to_scaled_obj_maps_voxel_space_to_unit(tmp_path):
    dims = (139, 104, 112)
    path = tmp_path / "sample_predicted.obj"
    # a box spanning the full voxel grid must land on [-0.5, 0.5]^3
    _box_obj(path, (0, 0, 0), dims)
    out = convert_to_scaled_obj(path, dims)
    assert out.name == "sample_predicted_normed.obj"
    v = load_obj(out).vertices
    np.testing.assert_allclose(v.min(axis=0), [-0.5] * 3, atol=1e-9)
    np.testing.assert_allclose(v.max(axis=0), [0.5] * 3, atol=1e-9)
    # grid center maps to the origin
    center = (v.min(axis=0) + v.max(axis=0)) / 2
    np.testing.assert_allclose(center, 0.0, atol=1e-9)


def test_convert_tree_walks_pattern(tmp_path):
    dims = (10, 8, 6)
    _box_obj(tmp_path / "a_predicted.obj", (0, 0, 0), dims)
    (tmp_path / "sub").mkdir()
    _box_obj(tmp_path / "sub" / "b_predicted.obj", (0, 0, 0), dims)
    _box_obj(tmp_path / "sub" / "c_other.obj", (0, 0, 0), dims)
    outs = convert_tree(tmp_path, dims=dims)
    assert sorted(p.name for p in outs) == [
        "a_predicted_normed.obj", "b_predicted_normed.obj",
    ]
