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
