"""Trilinear point sampling from 3D feature grids (torch ``F.grid_sample``
semantics, TPU-native layout).

This is the framework's core gather op (SURVEY.md §7 hard part #1).  Unlike
torch, which indexes grids in reversed (x=W, y=H, z=D) order and therefore
forces the reference to axis-swap its query points (reference
model/ifnet.py:94-95), this sampler addresses grid axis ``i`` with coordinate
``points[..., i]`` directly — there is no swap anywhere in sv3d_tpu.

TPU layout rules baked into this implementation (learned from OOM profiles on
v5e):
  * NO (N, 3)-shaped intermediates: a trailing dim of 3 is padded to 128 lanes
    by the (8, 128) tile layout — a 42x memory expansion on million-point
    sweeps.  All index math is per-axis on (B, N) arrays.
  * Features flow CHANNEL-MAJOR (B, C, N): N lives on the lane dimension, C on
    sublanes, so small channel counts (1..64 in the IF-Net pyramid) do not get
    padded to 128 lanes the way (B, N, C) gathers would.

Both torch coordinate conventions are supported (reference uses
align_corners=True for the 32-res IF-Net at model/ifnet.py:98 and the default
align_corners=False for the 128-res variant at model/ifnet.py:162), with zero
padding for out-of-bounds samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class Pyramid:
    """An encoded multi-level feature pyramid in the channel-major gather
    layout: flats[l] is (B, C_l, G0_l*G1_l*G2_l), dims[l] the static 3-D shape.

    Registered as a pytree with dims as STATIC aux data so a Pyramid can cross
    jit boundaries (e.g. encode once, then jit the query sweep over it)."""

    def __init__(self, flats, dims):
        self.flats = tuple(flats)
        self.dims = tuple(tuple(int(x) for x in d) for d in dims)

    def __iter__(self):
        return iter(zip(self.flats, self.dims))

    def __len__(self):
        return len(self.flats)

    def tree_flatten(self):
        return self.flats, self.dims

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.flats = tuple(children)
        obj.dims = tuple(aux)
        return obj


def _axis_indices(p, size: int, align_corners: bool):
    """Continuous coordinate in [-1, 1] -> (floor index, frac, validity bounds
    helper) for one grid axis; p is (B, N)."""
    if align_corners:
        ix = (p + 1.0) * 0.5 * (size - 1.0)
    else:
        ix = ((p + 1.0) * size - 1.0) * 0.5
    ix0f = jnp.floor(ix)
    frac = ix - ix0f
    return ix0f.astype(jnp.int32), frac


def sample_trilinear(
    grid: jnp.ndarray, points: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Sample grid values at continuous points with trilinear interpolation.

    Args:
      grid: (B, G0, G1, G2, C) feature volume (conv layout), or a pre-flattened
        channel-major (B, C, G0*G1*G2) volume via `flatten_grid`.
      points: (B, N, 3) coordinates in [-1, 1]; points[..., i] addresses grid
        axis i.  Out-of-range samples fade to zero (torch ``padding_mode='zeros'``).
      align_corners: torch semantics — True maps [-1, 1] to voxel centers
        [0, G-1]; False maps [-1, 1] to the voxel edges ([-0.5, G-0.5]).

    Returns:
      (B, C, N) interpolated features (channel-major).  Differentiable in both
      grid and points.
    """
    flat, dims = flatten_grid(grid)
    p0, p1, p2 = points[..., 0], points[..., 1], points[..., 2]
    return sample_trilinear_flat(flat, dims, (p0, p1, p2), align_corners)


def flatten_grid(grid: jnp.ndarray):
    """(B, G0, G1, G2, C) -> channel-major (B, C, G0*G1*G2) + dims.  Do this
    ONCE per encoded pyramid; query tiles then reuse the flat layout."""
    if grid.ndim == 3:
        raise ValueError("already flat; pass (flat, dims) to sample_trilinear_flat")
    b, g0, g1, g2, c = grid.shape
    # transpose FIRST: reshaping (B, G, C) with tiny minor C would pin an
    # (8, 128)-tile layout that lane-pads C (measured 8x HBM blowup / OOM on
    # the full-res 16-channel level at B=8); (B, C, G) keeps G on lanes
    flat = jnp.moveaxis(grid, -1, 1).reshape(b, c, g0 * g1 * g2)
    return flat, (g0, g1, g2)


def sample_trilinear_flat(
    flat: jnp.ndarray, dims: tuple, p_axes: tuple, align_corners: bool = False
) -> jnp.ndarray:
    """Core sampler over a channel-major flat grid.

    flat: (B, C, G0*G1*G2); p_axes: three (B, N) coordinate arrays in [-1, 1].
    Returns (B, C, N).
    """
    g0, g1, g2 = (int(d) for d in dims)
    p0, p1, p2 = p_axes

    i0, f0 = _axis_indices(p0, g0, align_corners)
    i1, f1 = _axis_indices(p1, g1, align_corners)
    i2, f2 = _axis_indices(p2, g2, align_corners)

    out = None
    for c0 in (0, 1):
        idx0 = i0 + c0
        v0 = (idx0 >= 0) & (idx0 < g0)
        w0 = f0 if c0 else 1.0 - f0
        idx0c = jnp.clip(idx0, 0, g0 - 1)
        for c1 in (0, 1):
            idx1 = i1 + c1
            v01 = v0 & (idx1 >= 0) & (idx1 < g1)
            w01 = w0 * (f1 if c1 else 1.0 - f1)
            idx01 = idx0c * g1 + jnp.clip(idx1, 0, g1 - 1)
            for c2 in (0, 1):
                idx2 = i2 + c2
                valid = v01 & (idx2 >= 0) & (idx2 < g2)
                w = jnp.where(valid, w01 * (f2 if c2 else 1.0 - f2), 0.0)
                lin = idx01 * g2 + jnp.clip(idx2, 0, g2 - 1)  # (B, N)
                # channel-major gather: (B, C, G) . (B, 1, N) -> (B, C, N)
                vals = jnp.take_along_axis(flat, lin[:, None, :], axis=2)
                contrib = w[:, None, :].astype(flat.dtype) * vals
                out = contrib if out is None else out + contrib
    return out


def displacement_axes(p_axes: tuple, displacement: float):
    """Expand three (B, N) coordinate arrays into their 7 displaced copies
    (center, +/-d along each axis; reference model/ifnet.py:82-91), returning
    three (B, 7*N) arrays.  Copy ordering: center, -d0, +d0, -d1, +d1, -d2,
    +d2 — displacement d is in the [-1, 1] sampling space."""
    p0, p1, p2 = p_axes
    d = displacement

    def stack(p, deltas):
        return jnp.concatenate([p + dd for dd in deltas], axis=1)

    p0_7 = stack(p0, [0.0, -d, d, 0.0, 0.0, 0.0, 0.0])
    p1_7 = stack(p1, [0.0, 0.0, 0.0, -d, d, 0.0, 0.0])
    p2_7 = stack(p2, [0.0, 0.0, 0.0, 0.0, 0.0, -d, d])
    return p0_7, p1_7, p2_7
