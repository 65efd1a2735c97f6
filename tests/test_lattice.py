"""Lattice fast-path tests: the separable-resize dense sweep must agree with
the gather-based query on the same lattice points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.config import IFNetConfig
from sv3d_tpu.geometry.transforms import make_3d_grid
from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.ops.lattice import axis_matrices, interp_matrix, lattice_coords


def test_interp_matrix_properties():
    m = interp_matrix(lattice_coords(10), 8, align_corners=True)
    assert m.shape == (10, 8)
    # in-range rows sum to 1 (partition of unity)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    # endpoints hit exact voxels under align_corners
    np.testing.assert_allclose(m[0], np.eye(8)[0], atol=1e-6)
    np.testing.assert_allclose(m[-1], np.eye(8)[-1], atol=1e-6)


def test_interp_matrix_zero_padding():
    # align_corners=False: lattice endpoints -1, 1 fall half a voxel outside
    # voxel centers; weight mass < 1 there (zeros padding)
    m = interp_matrix(np.array([-1.0, 0.0, 1.0]), 8, align_corners=False)
    assert m[0].sum() == pytest.approx(0.5, abs=1e-6)
    assert m[1].sum() == pytest.approx(1.0, abs=1e-6)
    assert m[2].sum() == pytest.approx(0.5, abs=1e-6)


@pytest.mark.parametrize("net_res,res_increase", [(32, 1), (128, 1), (32, 2)])
def test_lattice_matches_gather(net_res, res_increase):
    with jax.default_matmul_precision("highest"):
        _lattice_matches_gather(net_res, res_increase)


def _lattice_matches_gather(net_res, res_increase):
    cfg = IFNetConfig.for_net_res(net_res)
    model = IFNet(cfg)
    key = jax.random.PRNGKey(0)
    dims = (9, 8, 7)
    grid = jax.random.normal(key, (1, *dims, 1))
    pts0 = jnp.zeros((1, 8, 3))
    variables = model.init(key, grid, pts0, train=False)

    levels = model.apply(variables, grid, train=False, method=IFNet.encode)

    res = tuple(d * res_increase for d in dims)
    pts = make_3d_grid((-0.5,) * 3, (0.5,) * 3, dims, res_increase)[None]
    gather_logits = model.apply(variables, levels, pts, method=IFNet.query)
    gather_grid = np.asarray(gather_logits).reshape(res)

    slab = 4
    n_slabs = -(-res[0] // slab)
    out = np.empty((n_slabs * slab, res[1], res[2]), dtype=np.float32)
    for i in range(n_slabs):
        sl = model.apply(
            variables, levels, dims, res_increase, slab,
            jnp.asarray(i * slab, jnp.int32),
            method=IFNet.query_lattice, compute_dtype=jnp.float32,
            use_pallas_mlp=False,
        )
        out[i * slab : (i + 1) * slab] = np.asarray(sl[0])
    lattice_grid = out[: res[0]]

    np.testing.assert_allclose(lattice_grid, gather_grid, rtol=1e-4, atol=1e-5)


def test_axis_matrices_displacement():
    c, m, p = axis_matrices(6, 8, align_corners=True, displacement=0.1)
    # displaced matrices shift sampling locations: column center of row moves
    xc = (lattice_coords(6) + 1) * 0.5 * 7
    col_center = lambda mat: (mat * np.arange(8)).sum(axis=1) / np.clip(mat.sum(axis=1), 1e-9, None)
    np.testing.assert_allclose(col_center(c)[1:-1], xc[1:-1], atol=1e-6)
    shift = 0.1 * 0.5 * 7
    np.testing.assert_allclose(col_center(m)[1:-1], xc[1:-1] - shift, atol=1e-5)
    np.testing.assert_allclose(col_center(p)[1:-1], xc[1:-1] + shift, atol=1e-5)


@pytest.mark.parametrize("net_res", [128, 32])
def test_axis0_window_matches_dense(net_res):
    """The banded axis-0 window (dynamic-sliced input rows) must reproduce
    the dense axis-0 contraction at every slab position, including the edge
    and padded-beyond-edge offsets: dropped columns carry exactly-zero hat
    weights.  (The window is the fix for the full-scale sweep spending 96%
    of its time re-reading full volumes per slab — scripts/profile_sweep.py)."""
    cfg = IFNetConfig.for_net_res(net_res)
    model = IFNet(cfg)
    key = jax.random.PRNGKey(0)
    dims = (35, 13, 14)  # axis 0 long enough for the window to engage
    grid = jax.random.normal(key, (1, *dims, 1))
    variables = model.init(key, grid, jnp.zeros((1, 8, 3)), train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)

    slab = 2
    r0 = dims[0] * 2
    for off in (0, 1, 33, r0 - slab, r0):  # interior, edges, padded
        kw = dict(
            method=IFNet.query_lattice, compute_dtype=jnp.float32,
            use_pallas_mlp=False,
        )
        dense = model.apply(
            variables, levels, dims, 2, slab, jnp.asarray(off, jnp.int32),
            axis0_window=False, resize_mode="matmul", **kw,
        )
        windowed = model.apply(
            variables, levels, dims, 2, slab, jnp.asarray(off, jnp.int32),
            axis0_window=True, resize_mode="matmul", **kw,
        )
        np.testing.assert_allclose(
            np.asarray(windowed), np.asarray(dense), rtol=1e-5, atol=1e-5,
            err_msg=f"offset {off}",
        )
        # the take+blend resize (static gathers + VPU blend) must match the
        # banded-matmul formulation too
        taken = model.apply(
            variables, levels, dims, 2, slab, jnp.asarray(off, jnp.int32),
            axis0_window=True, resize_mode="take", **kw,
        )
        np.testing.assert_allclose(
            np.asarray(taken), np.asarray(dense), rtol=1e-5, atol=1e-5,
            err_msg=f"take offset {off}",
        )
