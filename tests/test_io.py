"""IO layer tests: EXR codec, .df/.sem volumes, OBJ meshes, image transforms."""

import numpy as np
import pytest

from sv3d_tpu.io import (
    TriMesh,
    down_sample,
    load_obj,
    load_rgb,
    normalize_rgb,
    read_df,
    read_exr,
    read_exr_channel,
    save_obj,
    square_pad_resize,
    write_df,
    write_exr,
)


def test_exr_read_fixture(fixture_dir):
    ch = read_exr(fixture_dir / "distance.exr")
    assert sorted(ch) == ["B", "G", "R"]
    r = ch["R"]
    assert r.shape == (240, 320)
    assert r.dtype == np.float32
    # all distance channels carry the same value (dataset/scene_net_data.py:82)
    assert np.array_equal(ch["R"], ch["G"]) and np.array_equal(ch["G"], ch["B"])
    assert 1.0 < r.min() < r.max() < 5.0


def test_exr_roundtrip(tmp_path, rng):
    img = rng.standard_normal((57, 123)).astype(np.float32)
    write_exr(tmp_path / "a.exr", {"R": img, "Z": img * 2}, compress=True)
    back = read_exr(tmp_path / "a.exr")
    assert np.array_equal(back["R"], img)
    assert np.array_equal(back["Z"], img * 2)
    write_exr(tmp_path / "b.exr", img, compress=False)
    assert np.array_equal(read_exr_channel(tmp_path / "b.exr", "Z"), img)


def test_df_roundtrip(tmp_path, rng):
    vol = rng.standard_normal((7, 5, 3)).astype(np.float32)
    write_df(tmp_path / "t.df", vol)
    back = read_df(tmp_path / "t.df")
    assert np.array_equal(back, vol)


def test_df_downsample():
    vol = np.arange(4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    ds = down_sample(vol, 2)
    assert ds.shape == (2, 2, 2)
    assert ds[0, 0, 0] == pytest.approx(vol[:2, :2, :2].mean())


def test_obj_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.5]])
    faces = np.array([[0, 1, 2], [0, 1, 3]])
    save_obj(tmp_path / "m.obj", verts, faces)
    mesh = load_obj(tmp_path / "m.obj")
    np.testing.assert_allclose(mesh.vertices, verts)
    assert np.array_equal(mesh.faces, faces)


def test_mesh_fixture(fixture_dir):
    mesh = load_obj(fixture_dir / "mesh.obj")
    assert len(mesh.vertices) > 1000
    assert len(mesh.faces) > 1000
    lo, hi = mesh.bounds
    assert np.all(hi > lo)


def test_mesh_sampling():
    # unit right triangle in z=0 plane: area 0.5, all samples inside
    mesh = TriMesh(np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]]), np.array([[0, 1, 2]]))
    assert mesh.face_areas[0] == pytest.approx(0.5)
    np.testing.assert_allclose(mesh.face_normals[0], [0, 0, 1])
    pts, idx = mesh.sample(500, return_index=True, rng=np.random.default_rng(0))
    assert pts.shape == (500, 3)
    assert np.all(idx == 0)
    assert np.all(pts[:, 2] == 0)
    assert np.all(pts.sum(axis=1) <= 1 + 1e-9)
    assert np.all(pts[:, :2] >= 0)


def test_mesh_transforms():
    mesh = TriMesh(np.eye(3), np.array([[0, 1, 2]]))
    mesh.apply_translation([1, 1, 1]).apply_scale(0.5)
    np.testing.assert_allclose(mesh.vertices[0], [1, 0.5, 0.5])


def test_image_transforms(fixture_dir):
    img = load_rgb(fixture_dir / "rgb.png")
    assert img.shape == (240, 320, 3)
    assert 0 <= img.min() and img.max() <= 1
    sq = square_pad_resize(img, 256)
    assert sq.shape == (256, 256, 3)
    chw = normalize_rgb(img)
    assert chw.shape == (3, 240, 320)
    assert -1 <= chw.min() and chw.max() <= 1
    flipped = load_rgb(fixture_dir / "rgb.png", flip_lr=True)
    np.testing.assert_allclose(flipped, img[:, ::-1])
