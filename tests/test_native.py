"""Native C++ geometry runtime tests: marching cubes, triangle hash, KD-tree."""

import numpy as np
import pytest

from sv3d_tpu.native import KDTree, TriangleHash, marching_cubes, marching_cubes_u8


def test_marching_cubes_sphere():
    n = 32
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    sdf = np.sqrt(((g - n / 2) ** 2).sum(axis=0)) - 10.0
    verts, tris = marching_cubes(sdf, 0.0)
    assert len(verts) > 500 and len(tris) > 500
    r = np.linalg.norm(verts - n / 2, axis=1)
    assert abs(r.mean() - 10.0) < 0.05
    assert r.std() < 0.05
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_marching_cubes_empty():
    vol = np.zeros((8, 8, 8), dtype=np.float32)
    verts, tris = marching_cubes(vol, 0.5)
    assert len(verts) == 0 and len(tris) == 0


def test_marching_cubes_watertight_plane():
    """A half-filled volume produces a plane at the interpolated level."""
    vol = np.zeros((4, 8, 8), dtype=np.float32)
    vol[2:] = 1.0
    verts, tris = marching_cubes(vol, 0.5)
    # isosurface at x = 1.5
    assert len(verts) > 0
    np.testing.assert_allclose(verts[:, 0], 1.5, atol=1e-6)


def test_marching_cubes_u8_matches_float_path(rng):
    """The u8 fixed-point entry point (serving pull format) must reproduce
    marching_cubes(1 - v/255, level) exactly: same triangles (the inside-test
    remap preserves every cube case) and vertices to float rounding (the edge
    interpolation is invariant under the affine level remap)."""
    x, y, z = np.meshgrid(
        *[np.linspace(-1, 1, n) for n in (33, 29, 31)], indexing="ij"
    )
    field = np.exp(-3 * (x**2 + 1.3 * y**2 + 0.8 * z**2))
    field = np.clip(field + 0.08 * rng.standard_normal(x.shape), 0, 1)
    u8 = (field * 255.0 + 0.5).astype(np.uint8)
    for level in (0.5, 0.3, 0.75):
        vf, tf = marching_cubes(1.0 - u8.astype(np.float32) / np.float32(255.0), level)
        vu, tu = marching_cubes_u8(u8, level)
        assert len(vf) > 100  # the blob actually crosses every tested level
        np.testing.assert_array_equal(tu, tf)
        np.testing.assert_allclose(vu, vf, atol=1e-4)


def test_marching_cubes_u8_empty():
    verts, tris = marching_cubes_u8(np.zeros((8, 8, 8), dtype=np.uint8), 0.5)
    assert len(verts) == 0 and len(tris) == 0


def test_triangle_hash_pairs():
    tris = np.array(
        [
            [[1.0, 1.0], [3.0, 1.0], [1.0, 3.0]],
            [[5.0, 5.0], [6.0, 5.0], [5.0, 6.0]],
        ]
    )
    th = TriangleHash(tris, 8)
    pi, ti = th.query(np.array([[1.5, 1.5], [5.2, 5.2], [7.5, 7.5], [-1.0, 0.0]]))
    pairs = set(zip(pi.tolist(), ti.tolist()))
    assert (0, 0) in pairs
    assert (1, 1) in pairs
    # out-of-bounds and empty-cell points yield no pairs
    assert not any(p == 2 or p == 3 for p, _ in pairs)


def test_triangle_hash_bbox_overlap():
    """A triangle is bucketed in every cell its bbox overlaps."""
    tris = np.array([[[0.5, 0.5], [3.5, 0.5], [0.5, 3.5]]])
    th = TriangleHash(tris, 8)
    # a point in the bbox but outside the triangle still yields a candidate
    pi, ti = th.query(np.array([[3.2, 3.2]]))
    assert len(pi) == 1


def test_kdtree_matches_bruteforce(rng):
    pts = rng.random((2000, 3)).astype(np.float32)
    q = rng.random((500, 3)).astype(np.float32)
    kd = KDTree(pts)
    dist, idx = kd.query(q)
    d2 = np.sqrt(((q[:, None] - pts[None]) ** 2).sum(-1))
    np.testing.assert_allclose(dist, d2.min(axis=1), atol=1e-5)
    assert (idx == d2.argmin(axis=1)).all()


def test_kdtree_exact_hits(rng):
    pts = rng.random((100, 3)).astype(np.float32)
    kd = KDTree(pts)
    dist, idx = kd.query(pts)
    np.testing.assert_allclose(dist, 0, atol=1e-6)
    assert (idx == np.arange(100)).all()


def test_format_obj_matches_python_formatter(rng):
    """The native OBJ serializer must be byte-identical to the per-line
    f"{x:.8g}" formatter it replaced (save_obj's fallback path)."""
    from sv3d_tpu.native import format_obj

    verts = np.concatenate(
        [
            rng.uniform(-300, 300, (500, 3)),
            rng.uniform(-1e-7, 1e-7, (50, 3)),
            rng.uniform(-1e12, 1e12, (50, 3)),
            np.round(rng.uniform(-50, 50, (50, 3))),
            np.zeros((2, 3)),
        ]
    ).astype(np.float32)
    faces = rng.integers(0, len(verts), (900, 3))
    expect = "".join(
        [f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n" for v in verts]
        + [f"f {f[0]} {f[1]} {f[2]}\n" for f in faces + 1]
    ).encode()
    assert format_obj(verts, faces) == expect
    # float64 inputs and the faces=None (point list) form
    assert format_obj(verts.astype(np.float64)[:7]) == "".join(
        f"v {v[0]:.8g} {v[1]:.8g} {v[2]:.8g}\n" for v in verts.astype(np.float64)[:7]
    ).encode()


def test_abi_handshake_detects_stale_library(tmp_path):
    """A binary missing geom_abi_version (or reporting the wrong one) must be
    rejected so the loader rebuilds it — the pure mtime check misses stale
    binaries whose timestamps a git checkout refreshed."""
    import ctypes
    import os
    import subprocess

    from sv3d_tpu import native

    assert native._abi_ok(native._lib)

    cxx = os.environ.get("CXX", "g++")  # same compiler the Makefile honors

    src = tmp_path / "old.cpp"
    src.write_text('extern "C" int unrelated_symbol() { return 0; }\n')
    subprocess.run(
        [cxx, "-O0", "-fPIC", "-shared", "-o", str(tmp_path / "old.so"), str(src)],
        check=True,
    )
    assert not native._abi_ok(ctypes.CDLL(str(tmp_path / "old.so")))

    src2 = tmp_path / "wrong.cpp"
    src2.write_text('extern "C" long geom_abi_version() { return -1; }\n')
    subprocess.run(
        [cxx, "-O0", "-fPIC", "-shared", "-o", str(tmp_path / "wrong.so"), str(src2)],
        check=True,
    )
    assert not native._abi_ok(ctypes.CDLL(str(tmp_path / "wrong.so")))
