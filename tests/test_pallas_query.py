"""Parity tests for the MXU-fused arbitrary-point query kernel
(sv3d_tpu/ops/pallas/point_query.py) against the exact XLA gather path.

Run in Pallas interpret mode on the CPU backend (conftest); the same code
compiles via Mosaic on TPU.  bf16 compute => ~1e-2 relative tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.ops.grid_sample import (
    displacement_axes,
    flatten_grid,
    sample_trilinear_flat,
)
from sv3d_tpu.ops.pallas.point_query import (
    TILE,
    _level_windows,
    bucket_queries,
    bucket_queries_2d,
    level_features,
    level_features_banded,
)

RNG = np.random.default_rng(7)


def _reference(vol, pts, disp, ac):
    """(B, 7, N, C) displacement-major features via the XLA gather path."""
    b, n = pts.shape[:2]
    c = vol.shape[-1]
    flat, dims = flatten_grid(jnp.asarray(vol))
    pd = displacement_axes(
        tuple(jnp.asarray(pts[..., i]) for i in range(3)), disp
    )
    ref = sample_trilinear_flat(flat, dims, pd, align_corners=ac)
    return np.moveaxis(np.asarray(ref), 1, 2).reshape(b, 7, n, c)


def _fused(vol, pts, disp, ac, g0_fine):
    b, n = pts.shape[:2]
    c = vol.shape[-1]
    p0, p1, p2 = (jnp.asarray(pts[..., i]) for i in range(3))
    q0, q1, q2, pos, tile_slab, tile_used = bucket_queries(p0, p1, p2, g0_fine, ac)
    feats = level_features(
        jnp.asarray(vol), q0, q1, q2, tile_slab, tile_used, vol.shape[1:4],
        g0_fine, ac, disp, interpret=True,
    )
    got = np.take_along_axis(np.asarray(feats), np.asarray(pos)[..., None], axis=1)
    return got.reshape(b, n, 7, c).transpose(0, 2, 1, 3)


def test_bucket_queries_invariants():
    b, n, g0 = 2, 257, 19
    pts = RNG.uniform(-1.2, 1.2, (b, n, 3)).astype(np.float32)
    p = [jnp.asarray(pts[..., i]) for i in range(3)]
    q0, q1, q2, pos, tile_slab, tile_used = bucket_queries(p[0], p[1], p[2], g0, False)
    pos = np.asarray(pos)
    # positions are unique per batch row and within the padded capacity
    for bi in range(b):
        assert len(set(pos[bi])) == n
    assert q0.shape[1] % TILE == 0
    assert pos.max() < q0.shape[1]
    # padded slots carry the sentinel, real slots the original coords
    q0 = np.asarray(q0)
    for bi in range(b):
        np.testing.assert_allclose(q0[bi, pos[bi]], pts[bi, :, 0], rtol=1e-6)
        mask = np.ones(q0.shape[1], bool)
        mask[pos[bi]] = False
        assert (q0[bi, mask] == 2.0).all()


@pytest.mark.parametrize("ac", [False, True])
@pytest.mark.parametrize("c", [1, 16])
def test_level_features_parity(ac, c):
    dims = (19, 13, 14)
    disp = 0.0722
    b, n = 2, 200
    vol = RNG.standard_normal((b, *dims, c), dtype=np.float32)
    pts = RNG.uniform(-1.3, 1.3, (b, n, 3)).astype(np.float32)  # incl. OOB
    ref = _reference(vol, pts, disp, ac)
    got = _fused(vol, pts, disp, ac, g0_fine=dims[0])
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 3e-2, err.max()


def _fused_banded(vol, pts, disp, ac, g0_fine, g1_fine, band_cols):
    b, n = pts.shape[:2]
    c = vol.shape[-1]
    p0, p1, p2 = (jnp.asarray(pts[..., i]) for i in range(3))
    q0, q1, q2, pos, tile_slab, tile_band, tile_used = bucket_queries_2d(
        p0, p1, p2, g0_fine, g1_fine, ac, band_cols
    )
    feats = level_features_banded(
        jnp.asarray(vol), q0, q1, q2, tile_slab, tile_band, tile_used,
        vol.shape[1:4], g0_fine, g1_fine, ac, disp, band_cols, interpret=True,
    )
    got = np.take_along_axis(np.asarray(feats), np.asarray(pos)[..., None], axis=1)
    return got.reshape(b, n, 7, c).transpose(0, 2, 1, 3)


def test_bucket_queries_2d_invariants():
    b, n, g0, g1 = 2, 300, 19, 16
    pts = RNG.uniform(-1.2, 1.2, (b, n, 3)).astype(np.float32)
    p = [jnp.asarray(pts[..., i]) for i in range(3)]
    q0, q1, q2, pos, tile_slab, tile_band, tile_used = bucket_queries_2d(
        p[0], p[1], p[2], g0, g1, False, band_cols=8
    )
    pos, q0 = np.asarray(pos), np.asarray(q0)
    assert q0.shape[1] % TILE == 0 and pos.max() < q0.shape[1]
    for bi in range(b):
        assert len(set(pos[bi])) == n  # bijective placement
        np.testing.assert_allclose(q0[bi, pos[bi]], pts[bi, :, 0], rtol=1e-6)
        mask = np.ones(q0.shape[1], bool)
        mask[pos[bi]] = False
        assert (q0[bi, mask] == 2.0).all()
    # per-tile used counts sum to n
    np.testing.assert_array_equal(np.asarray(tile_used).sum(axis=1), [n, n])
    assert np.asarray(tile_band).max() < -(-g1 // 8)


@pytest.mark.parametrize("ac", [False, True])
@pytest.mark.parametrize("band_cols", [4, 8])
def test_level_features_banded_parity(ac, band_cols):
    """2-D (slab, band) bucketing matches the gather reference, including
    out-of-range points and both align_corners conventions."""
    dims = (19, 13, 14)
    disp = 0.0722
    b, n, c = 2, 200, 16
    vol = RNG.standard_normal((b, *dims, c), dtype=np.float32)
    pts = RNG.uniform(-1.3, 1.3, (b, n, 3)).astype(np.float32)
    ref = _reference(vol, pts, disp, ac)
    got = _fused_banded(vol, pts, disp, ac, dims[0], dims[1], band_cols)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 3e-2, err.max()


def test_level_features_banded_coarse_level():
    """Coarse level under fine-axis banding: the column window degenerates to
    the whole padded axis (WCOLS == g1p) and must still match."""
    fine = (19, 16)
    dims, c = (5, 4, 4), 8
    vol = RNG.standard_normal((1, *dims, c), dtype=np.float32)
    pts = RNG.uniform(-1.0, 1.0, (1, 150, 3)).astype(np.float32)
    ref = _reference(vol, pts, 0.035, True)
    got = _fused_banded(vol, pts, 0.035, True, fine[0], fine[1], band_cols=4)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 3e-2, err.max()


def test_query_fused_banded_matches_query():
    """End-to-end IFNet with bands=: logits match the exact gather path."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(32))
    key = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(key, (2, 18, 13, 14, 1)) > 0.9).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 100, 3), minval=-0.55, maxval=0.55
    )
    variables = model.init(key, grid, pts, train=False)
    ref = np.asarray(model.apply(variables, grid, pts, train=False))
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    got = np.asarray(
        model.apply(variables, levels, pts, interpret=True, bands=4,
                    method=IFNet.query_fused)
    )
    scale = np.abs(ref).max() + 1.0
    assert np.abs(got - ref).max() < 0.05 * scale, np.abs(got - ref).max()


def test_query_fused_col_shift_matches_banded():
    """col_shift (per-displacement column sub-windows, the K-fill geometry
    experiment): identical math over a smaller contraction window — logits
    must match the plain banded path EXACTLY, and the gather path within the
    usual bf16 tolerance."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(32))
    key = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(key, (2, 18, 13, 14, 1)) > 0.9).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 100, 3), minval=-0.55, maxval=0.55
    )
    variables = model.init(key, grid, pts, train=False)
    ref = np.asarray(model.apply(variables, grid, pts, train=False))
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    for bands in (3, 4):
        banded = np.asarray(
            model.apply(variables, levels, pts, interpret=True, bands=bands,
                        method=IFNet.query_fused)
        )
        shifted = np.asarray(
            model.apply(variables, levels, pts, interpret=True, bands=bands,
                        col_shift=True, method=IFNet.query_fused)
        )
        np.testing.assert_array_equal(shifted, banded)
        scale = np.abs(ref).max() + 1.0
        assert np.abs(shifted - ref).max() < 0.05 * scale


def test_band_windows_disp_geometry():
    """The per-displacement sub-windows cover their hat support and actually
    shrink K at full IF-Net-128 dims (wcols 24 -> 16 at band_cols=5 on the
    full-res levels: wrows*wcols 168 -> 112, one exactly-fillable 128-deep
    MXU K-pass)."""
    from sv3d_tpu.ops.pallas.point_query import (
        _band_windows,
        _band_windows_disp,
    )

    dims = (139, 104, 112)
    _, wcols = _band_windows(208, dims, False, 0.0722, 5)
    coff, wcols_k = _band_windows_disp(208, dims, False, 0.0722, 5)
    assert wcols == 24 and wcols_k == 16, (wcols, wcols_k)
    assert coff.shape[1] == 3 and (coff >= 0).all()
    # coverage asserts inside _band_windows_disp already ran; degenerate
    # coarse level: sub-window == whole padded axis, offsets zero
    coff_c, wk_c = _band_windows_disp(208, (8, 6, 7), False, 0.0722, 5)
    assert (coff_c == 0).all() and wk_c == 8


def test_level_features_coarse_level():
    """Coarse level (dims much smaller than the fine bucketing axis) — the
    whole-level window path (ROWS == g0l)."""
    fine, dims, c = 19, (5, 4, 4), 8
    vol = RNG.standard_normal((1, *dims, c), dtype=np.float32)
    pts = RNG.uniform(-1.0, 1.0, (1, 150, 3)).astype(np.float32)
    ref = _reference(vol, pts, 0.035, True)
    got = _fused(vol, pts, 0.035, True, g0_fine=fine)
    err = np.abs(got - ref) / np.maximum(np.abs(ref), 1.0)
    assert err.max() < 3e-2, err.max()


def test_level_windows_cover_all_rows():
    """Static window tables must cover every row a slab's queries can touch,
    for fine and coarse levels, both conventions, both displacements."""
    for ac in (False, True):
        for g0f, g0l in ((139, 139), (139, 70), (139, 18), (19, 19), (19, 5)):
            for disp in (0.0722, 0.035):
                tab_lo, woff, rows, wrows = _level_windows(
                    g0f, (g0l, 8, 8), ac, disp
                )
                af = 0.5 * (g0f - 1) if ac else 0.5 * g0f
                bf = 0.5 * (g0f - 1)
                al = 0.5 * (g0l - 1) if ac else 0.5 * g0l
                bl = 0.5 * (g0l - 1)
                ns = len(tab_lo)
                for s in range(ns):
                    # densest sweep of fine ixs owned by slab s
                    ixf = np.linspace(s * 4, s * 4 + 4, 41)[:-1]
                    p = (ixf - bf) / af
                    for j, dd in enumerate((-1, 0, 1)):
                        ixl = al * (p + dd * disp) + bl
                        for corner in (np.floor(ixl), np.floor(ixl) + 1):
                            valid = (corner >= 0) & (corner <= g0l - 1)
                            local = corner - tab_lo[s] - woff[s, j]
                            ok = (local >= 0) & (local < wrows)
                            assert ok[valid].all(), (
                                ac, g0f, g0l, disp, s, dd,
                                corner[valid & ~ok],
                            )


def test_query_fused_matches_query():
    """End-to-end IFNet: fused path logits match the exact gather path."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(32))
    key = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(key, (2, 18, 13, 14, 1)) > 0.9).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 100, 3), minval=-0.55, maxval=0.55
    )
    variables = model.init(key, grid, pts, train=False)

    ref = np.asarray(model.apply(variables, grid, pts, train=False))
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    got = np.asarray(
        model.apply(variables, levels, pts, interpret=True,
                    method=IFNet.query_fused)
    )
    assert got.shape == ref.shape
    scale = np.abs(ref).max() + 1.0
    assert np.abs(got - ref).max() < 0.05 * scale, np.abs(got - ref).max()


def test_encode_never_produces_empty_levels_and_fused_query_runs():
    """At degenerate tiny dims the floor max-pool used to emit an EMPTY
    pyramid level ((1, 0, 0) at dims (17, 13, 14) with 6 levels), which the
    fused point-query kernel cannot take (zero-size volume block); the XLA
    paths silently tolerated it.  encode now clamps every pooled dim to
    >= 1 (identity at real scales).  Regression for the multichip dryrun's
    scale_factor=8 fused sharded query."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))
    key = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(key, (1, 17, 13, 14, 1)) > 0.9).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 64, 3), minval=-0.45, maxval=0.45
    )
    variables = model.init(key, grid, pts, train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    assert all(min(d) >= 1 for d in levels.dims), levels.dims

    got = np.asarray(
        model.apply(variables, levels, pts, interpret=True,
                    method=IFNet.query_fused)
    )
    ref = np.asarray(
        model.apply(variables, levels, pts, method=IFNet.query)
    )
    assert np.isfinite(got).all()
    scale = np.abs(ref).max() + 1.0
    assert np.abs(got - ref).max() < 0.05 * scale, np.abs(got - ref).max()
