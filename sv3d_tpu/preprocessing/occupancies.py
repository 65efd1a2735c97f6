"""Occupancy supervision sampling (reference data_processing/mesh_occupancies.py).

Coordinate note: meshes extracted from the distance fields live in voxel-index
space (0..dims); normalizing with translate(-dims/2) + scale(1/dims) puts them
exactly in the framework's normed grid space [-0.5, 0.5]^3 with coordinate i =
grid axis i — the same space the IF-Net queries (no axis swap; see
sv3d_tpu/geometry/transforms.py).  The reference additionally emits
'grid_coords' (axis-swapped, doubled; mesh_occupancies.py:19-20) purely for
torch grid_sample; we keep writing that key for file-format compatibility.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from sv3d_tpu.io.mesh import TriMesh, load_obj
from sv3d_tpu.preprocessing.waterproofing import implicit_waterproofing


def _normalize_mesh(mesh: TriMesh, dims) -> TriMesh:
    return mesh.apply_translation(-np.asarray(dims, dtype=np.float64) / 2).apply_scale(
        1.0 / np.asarray(dims, dtype=np.float64)
    )


def sample_points(mesh_path: str | Path, dims, sample_num: int, sigma: float, rng=None):
    """Sample occupancy supervision points around a GT mesh
    (reference mesh_occupancies.py:9-22):
      surface samples + N(0, sigma) noise, plus 10% uniform points in the unit
      cube, labeled by waterproofing.
    Returns (boundary_points, occupancies, grid_coords)."""
    rng = np.random.default_rng() if rng is None else rng
    mesh = _normalize_mesh(load_obj(mesh_path), dims)
    points = mesh.sample(sample_num, rng=rng)
    boundary_points = points + sigma * rng.standard_normal((sample_num, 3))
    random_points = rng.uniform(-0.5, 0.5, size=(int(sample_num * 0.1), 3))
    boundary_points = np.vstack([boundary_points, random_points])
    # reference-format torch grid_sample coords (swap axis 0<->2, double)
    grid_coords = boundary_points.copy()
    grid_coords[:, 0], grid_coords[:, 2] = (
        boundary_points[:, 2],
        boundary_points[:, 0].copy(),
    )
    grid_coords = 2 * grid_coords
    occupancies = implicit_waterproofing(mesh, boundary_points)[0]
    return boundary_points, occupancies, grid_coords


def determine_occupancy(mesh_paths, points: np.ndarray, dims=(139, 104, 112)):
    """Label batched point clouds against their GT meshes
    (reference mesh_occupancies.py:24-53).

    points: (B, N, 3) already in normed grid space [-0.5, 0.5] (the projected
    cloud from the scene-net forward).  NOTE: the reference's own normalization
    here is buggy (mesh_occupancies.py:29-31 *assigns* dims to the coords
    instead of scaling); since its input is already normed, the correct
    behavior — implemented here — is to query the points as-is against the
    unit-normalized mesh.

    Returns (points, occupancies (B, N) float32).
    """
    points = np.asarray(points)
    occs = np.zeros((len(mesh_paths), points.shape[1]), dtype=np.float32)
    for i, path in enumerate(mesh_paths):
        mesh = _normalize_mesh(load_obj(path), dims)
        occs[i] = implicit_waterproofing(mesh, points[i])[0].astype(np.float32)
    return points, occs
