"""Preprocessing tests: waterproofing, occupancy sampling, process_sample."""

import numpy as np
import pytest

from sv3d_tpu.io.mesh import TriMesh
from sv3d_tpu.preprocessing.occupancies import determine_occupancy, sample_points
from sv3d_tpu.preprocessing.waterproofing import (
    check_mesh_contains,
    implicit_waterproofing,
)


def _box_mesh(lo=-0.25, hi=0.25) -> TriMesh:
    """Axis-aligned watertight cube [lo, hi]^3."""
    v = np.array(
        [[lo, lo, lo], [hi, lo, lo], [hi, hi, lo], [lo, hi, lo],
         [lo, lo, hi], [hi, lo, hi], [hi, hi, hi], [lo, hi, hi]]
    )
    f = np.array(
        [[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7], [0, 1, 5], [0, 5, 4],
         [2, 3, 7], [2, 7, 6], [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]]
    )
    return TriMesh(v, f)


def test_check_mesh_contains_box(rng):
    mesh = _box_mesh()
    inside = rng.uniform(-0.2, 0.2, size=(200, 3))
    outside = np.vstack(
        [rng.uniform(0.3, 0.45, size=(100, 3)), rng.uniform(-0.45, -0.3, size=(100, 3))]
    )
    occ_in, _ = check_mesh_contains(mesh, inside)
    occ_out, _ = check_mesh_contains(mesh, outside)
    assert occ_in.mean() > 0.99
    assert occ_out.mean() < 0.01


def test_waterproofing_repairs_holes(rng):
    mesh = _box_mesh()
    pts = rng.uniform(-0.45, 0.45, size=(2000, 3))
    occ, holes = implicit_waterproofing(mesh, pts)
    expected = np.all(np.abs(pts) < 0.25, axis=1)
    assert (occ == expected).mean() > 0.995
    assert holes.mean() < 0.01


def test_sample_points_labels(tmp_path, rng):
    mesh = _box_mesh(-0.25, 0.25)
    # put the cube into "voxel space" (0..dims) so sample_points normalizes it back
    dims = (10, 10, 10)
    voxel_mesh = mesh.copy().apply_scale(dims).apply_translation(np.asarray(dims) / 2)
    path = tmp_path / "mesh.obj"
    voxel_mesh.export(path)
    pts, occ, grid_coords = sample_points(path, dims, 500, sigma=0.05, rng=rng)
    assert pts.shape == (550, 3)  # 500 + 10% uniform
    assert occ.shape == (550,)
    # points near the surface should be ~half inside
    assert 0.2 < occ[:500].mean() < 0.8
    # grid_coords = swapped + doubled (reference format)
    np.testing.assert_allclose(grid_coords[:, 1], 2 * pts[:, 1])
    np.testing.assert_allclose(grid_coords[:, 0], 2 * pts[:, 2])
    np.testing.assert_allclose(grid_coords[:, 2], 2 * pts[:, 0])


def test_determine_occupancy(tmp_path, rng):
    dims = (10, 10, 10)
    voxel_mesh = _box_mesh().apply_scale(dims).apply_translation(np.asarray(dims) / 2)
    path = tmp_path / "m.obj"
    voxel_mesh.export(path)
    pts = rng.uniform(-0.45, 0.45, size=(2, 300, 3)).astype(np.float32)
    _, occ = determine_occupancy([str(path), str(path)], pts, dims)
    assert occ.shape == (2, 300)
    expected = np.all(np.abs(pts) < 0.25, axis=-1)
    assert (occ == expected).mean() > 0.99


def test_process_sample_fixture(tmp_path, fixture_dir, processed_dir):
    """depth_grid produced by the host-side preprocessing path must match the
    reference fixture exactly."""
    from sv3d_tpu.preprocessing.process_sample import depth_grid_from_distance

    _, grid, dims = depth_grid_from_distance(
        fixture_dir / "distance.exr", fixture_dir / "intrinsic.txt"
    )
    assert dims == (139, 104, 112)
    ref = np.load(processed_dir / "depth_grid.npz")["grid"]
    assert np.array_equal(grid, ref)


def test_waterproofing_fixture_mesh(fixture_dir, rng):
    """The real scene mesh labels a plausible fraction of its bbox as inside."""
    from sv3d_tpu.io.mesh import load_obj
    from sv3d_tpu.preprocessing.occupancies import _normalize_mesh

    mesh = _normalize_mesh(load_obj(fixture_dir / "mesh.obj"), (139, 104, 112))
    pts = rng.uniform(-0.5, 0.5, size=(5000, 3))
    occ, holes = implicit_waterproofing(mesh, pts)
    assert 0.005 < occ.mean() < 0.9
    assert holes.mean() < 0.05
