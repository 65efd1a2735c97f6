"""Lattice (dense-grid) feature interpolation as separable banded matmuls.

For dense-grid inference the query points form a REGULAR LATTICE over
[-0.5, 0.5]^3 (reference model/ifnet.py:202-229).  Trilinear interpolation of
a regular lattice is a separable linear resize: for each grid axis there is a
small banded matrix M (r_out x g_in) with at most two nonzeros per row, and

    features[r0, r1, r2, c] = sum_ijk M0[r0,i] M1[r1,j] M2[r2,k] V[i,j,k,c]

i.e. three small matmuls per feature level — pure MXU work.  This removes the
per-point gathers entirely, which on TPU are the bottleneck of the
grid_sample formulation (~0.5M pts/s measured); the lattice path turns the
same math into dense contractions.

The 7 displaced query copies (reference model/ifnet.py:82-91) only shift the
sampling coordinates along ONE axis each, so each displacement swaps in a
shifted matrix for that axis and reuses the other two.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interp_matrix(
    out_coords: np.ndarray, g: int, align_corners: bool, dtype=np.float32
) -> np.ndarray:
    """(r, g) trilinear interpolation matrix for one axis.

    out_coords: normalized coordinates in [-1, 1] (torch grid_sample
    convention); out-of-range samples get zero rows (padding_mode='zeros')."""
    x = np.asarray(out_coords, dtype=np.float64)
    if align_corners:
        ix = (x + 1.0) * 0.5 * (g - 1.0)
    else:
        ix = ((x + 1.0) * g - 1.0) * 0.5
    i0 = np.floor(ix)
    frac = ix - i0
    rows = np.arange(len(x))
    m = np.zeros((len(x), g), dtype=np.float64)
    for corner, w in ((i0, 1.0 - frac), (i0 + 1.0, frac)):
        valid = (corner >= 0) & (corner < g)
        m[rows[valid], corner[valid].astype(int)] += w[valid]
    return m.astype(dtype)


def lattice_coords(r: int) -> np.ndarray:
    """The dense sweep's per-axis coordinates: linspace(-0.5, 0.5, r) doubled
    into [-1, 1] (reference make_3d_grid + the x2 in ifnet.py:94-95)."""
    return 2.0 * np.linspace(-0.5, 0.5, r)


def axis_matrices(
    r: int, g: int, align_corners: bool, displacement: float
) -> tuple:
    """(center, minus, plus) interpolation matrices for one axis: the center
    lattice and the lattice shifted by -/+ displacement (in [-1, 1] space)."""
    x = lattice_coords(r)
    return (
        interp_matrix(x, g, align_corners),
        interp_matrix(x - displacement, g, align_corners),
        interp_matrix(x + displacement, g, align_corners),
    )


def axis_taps(r: int, g: int, align_corners: bool, displacement: float = 0.0):
    """Static 2-tap interpolation data for one lattice axis: per output row
    the floor/ceil input indices and their hat weights (zeroed out of range —
    grid_sample padding_mode='zeros').  The take+blend formulation of the
    banded interp_matrix: two static gathers and a VPU blend instead of a
    small-K matmul (K = the coarse level's axis size, 6-56, runs the MXU at
    5-15% efficiency — profiled as ~95% of dense-sweep time at full scale)."""
    x = lattice_coords(r) + displacement
    x = np.asarray(x, np.float64)
    if align_corners:
        ix = (x + 1.0) * 0.5 * (g - 1.0)
    else:
        ix = ((x + 1.0) * g - 1.0) * 0.5
    i0 = np.floor(ix)
    f = ix - i0
    w0 = (1.0 - f) * ((i0 >= 0) & (i0 <= g - 1))
    w1 = f * ((i0 + 1 >= 0) & (i0 + 1 <= g - 1))
    return (
        np.clip(i0, 0, g - 1).astype(np.int32),
        w0.astype(np.float32),
        np.clip(i0 + 1, 0, g - 1).astype(np.int32),
        w1.astype(np.float32),
    )


def axis_taps_triple(r: int, g: int, align_corners: bool, displacement: float):
    """(center, minus, plus) taps for one axis (the take+blend twin of
    axis_matrices)."""
    return (
        axis_taps(r, g, align_corners, 0.0),
        axis_taps(r, g, align_corners, -displacement),
        axis_taps(r, g, align_corners, +displacement),
    )


def take_blend(v: jnp.ndarray, axis: int, taps, dtype=None) -> jnp.ndarray:
    """2-tap interpolation along one axis with STATIC indices: two constant
    gathers (compile to data movement, no MXU) + an elementwise blend."""
    i0, w0, i1, w1 = taps
    dtype = v.dtype if dtype is None else dtype
    shape = [1] * v.ndim
    shape[axis] = len(i0)
    if v.shape[axis] == 0:  # degenerate level (tiny test grids): all padding
        out_shape = list(v.shape)
        out_shape[axis] = len(i0)
        return jnp.zeros(out_shape, dtype)
    w0 = jnp.asarray(w0, dtype).reshape(shape)
    w1 = jnp.asarray(w1, dtype).reshape(shape)
    return (
        jnp.take(v, jnp.asarray(i0), axis=axis) * w0
        + jnp.take(v, jnp.asarray(i1), axis=axis) * w1
    )


def displaced_resizes_take(vol: jnp.ndarray, mats0, taps1, taps2) -> list:
    """All 7 displaced resizes of a channel-major (B, C, g0, g1, g2) volume
    with the axis-0 interpolation as a (windowed) banded matmul and axes 1/2
    as take+blend.  Same sharing structure and displacement order as
    displaced_resizes_cm."""
    c0, m0, p0 = mats0
    tc1, tm1, tp1 = taps1
    tc2, tm2, tp2 = taps2

    v0c = jnp.einsum("ai,bcijk->bcajk", c0, vol)
    v01c = take_blend(v0c, 3, tc1)

    out = [None] * 7
    out[0] = take_blend(v01c, 4, tc2)
    out[5] = take_blend(v01c, 4, tm2)
    out[6] = take_blend(v01c, 4, tp2)
    out[3] = take_blend(take_blend(v0c, 3, tm1), 4, tc2)
    out[4] = take_blend(take_blend(v0c, 3, tp1), 4, tc2)
    v0m = jnp.einsum("ai,bcijk->bcajk", m0, vol)
    v0p = jnp.einsum("ai,bcijk->bcajk", p0, vol)
    out[1] = take_blend(take_blend(v0m, 3, tc1), 4, tc2)
    out[2] = take_blend(take_blend(v0p, 3, tc1), 4, tc2)
    return out


def resize_volume_cm(vol: jnp.ndarray, m0, m1, m2) -> jnp.ndarray:
    """Apply separable interpolation matrices to a CHANNEL-MAJOR volume
    (B, C, g0, g1, g2) -> (B, C, r0, r1, r2).  Three MXU contractions."""
    v = jnp.einsum("ai,bcijk->bcajk", m0, vol)
    v = jnp.einsum("xj,bcajk->bcaxk", m1, v)
    v = jnp.einsum("yk,bcaxk->bcaxy", m2, v)
    return v


def displaced_resizes_cm(vol: jnp.ndarray, mats0, mats1, mats2) -> list:
    """All 7 displaced resizes of a channel-major (B, C, g0, g1, g2) volume,
    sharing partial products.

    mats{0,1,2} = (center, minus, plus) per axis.  Returns volumes in the
    displacement order of sv3d_tpu.ops.grid_sample.displacement_axes:
    [center, -d0, +d0, -d1, +d1, -d2, +d2], each (B, C, r0, r1, r2)."""
    c0, m0, p0 = mats0
    c1, m1, p1 = mats1
    c2, m2, p2 = mats2

    # shared partials
    v0c = jnp.einsum("ai,bcijk->bcajk", c0, vol)       # axis0 center applied
    v01c = jnp.einsum("xj,bcajk->bcaxk", c1, v0c)      # + axis1 center

    out = [None] * 7
    out[0] = jnp.einsum("yk,bcaxk->bcaxy", c2, v01c)   # center
    out[5] = jnp.einsum("yk,bcaxk->bcaxy", m2, v01c)   # -d2
    out[6] = jnp.einsum("yk,bcaxk->bcaxy", p2, v01c)   # +d2
    # -d1 / +d1: reuse v0c
    out[3] = jnp.einsum("yk,bcaxk->bcaxy", c2, jnp.einsum("xj,bcajk->bcaxk", m1, v0c))
    out[4] = jnp.einsum("yk,bcaxk->bcaxy", c2, jnp.einsum("xj,bcajk->bcaxk", p1, v0c))
    # -d0 / +d0: new axis0 pass
    v0m = jnp.einsum("ai,bcijk->bcajk", m0, vol)
    v0p = jnp.einsum("ai,bcijk->bcajk", p0, vol)
    out[1] = jnp.einsum("yk,bcaxk->bcaxy", c2, jnp.einsum("xj,bcajk->bcaxk", c1, v0m))
    out[2] = jnp.einsum("yk,bcaxk->bcaxy", c2, jnp.einsum("xj,bcajk->bcaxk", c1, v0p))
    return out
