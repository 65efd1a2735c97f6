"""Trilinear point sampling from 3D feature grids (torch ``F.grid_sample``
semantics, TPU-native layout).

This is the framework's core gather op (SURVEY.md §7 hard part #1).  Unlike
torch, which indexes grids in reversed (x=W, y=H, z=D) order and therefore
forces the reference to axis-swap its query points (reference
model/ifnet.py:94-95), this sampler addresses grid axis ``i`` with coordinate
``points[..., i]`` directly — there is no swap anywhere in sv3d_tpu.

Layout is channels-last (B, G0, G1, G2, C): the natural XLA/TPU conv layout,
keeping C on the 128-wide lane dimension for both the convs that produce the
grids and the gathers performed here.

Both torch coordinate conventions are supported (reference uses
align_corners=True for the 32-res IF-Net at model/ifnet.py:98 and the default
align_corners=False for the 128-res variant at model/ifnet.py:162), with zero
padding for out-of-bounds samples.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_trilinear(
    grid: jnp.ndarray, points: jnp.ndarray, align_corners: bool = False
) -> jnp.ndarray:
    """Sample grid values at continuous points with trilinear interpolation.

    Args:
      grid: (B, G0, G1, G2, C) feature volume.
      points: (B, N, 3) coordinates in [-1, 1]; points[..., i] addresses grid
        axis i.  Out-of-range samples fade to zero (torch ``padding_mode='zeros'``).
      align_corners: torch semantics — True maps [-1, 1] to voxel centers
        [0, G-1]; False maps [-1, 1] to the voxel edges ([-0.5, G-0.5]).

    Returns:
      (B, N, C) interpolated features.  Differentiable in both grid and points.
    """
    b, g0, g1, g2, c = grid.shape
    sizes = jnp.asarray([g0, g1, g2], dtype=points.dtype)
    if align_corners:
        ix = (points + 1.0) * 0.5 * (sizes - 1.0)
    else:
        ix = ((points + 1.0) * sizes - 1.0) * 0.5

    ix0f = jnp.floor(ix)
    frac = ix - ix0f
    i0 = ix0f.astype(jnp.int32)

    flat = grid.reshape(b, g0 * g1 * g2, c)
    isz = jnp.asarray([g0, g1, g2], dtype=jnp.int32)

    out = jnp.zeros((b, points.shape[1], c), dtype=grid.dtype)
    for c0 in (0, 1):
        for c1 in (0, 1):
            for c2 in (0, 1):
                corner = jnp.asarray([c0, c1, c2], dtype=jnp.int32)
                idx = i0 + corner
                valid = jnp.all((idx >= 0) & (idx < isz), axis=-1)
                w = (
                    (frac[..., 0] if c0 else 1.0 - frac[..., 0])
                    * (frac[..., 1] if c1 else 1.0 - frac[..., 1])
                    * (frac[..., 2] if c2 else 1.0 - frac[..., 2])
                )
                w = jnp.where(valid, w, 0.0)
                idx = jnp.clip(idx, 0, isz - 1)
                lin = (idx[..., 0] * g1 + idx[..., 1]) * g2 + idx[..., 2]
                vals = jnp.take_along_axis(flat, lin[..., None], axis=1)
                out = out + w[..., None].astype(grid.dtype) * vals
    return out


def displacement_offsets(displacement: float, dtype=jnp.float32) -> jnp.ndarray:
    """(7, 3) query-point offsets in [-1, 1] space: center followed by +/-
    displacement along each coordinate axis (reference model/ifnet.py:82-91,
    144-152).  Order: center, -d0, +d0, -d1, +d1, -d2, +d2."""
    offs = [[0.0, 0.0, 0.0]]
    for axis in range(3):
        for s in (-1.0, 1.0):
            o = [0.0, 0.0, 0.0]
            o[axis] = s * displacement
            offs.append(o)
    return jnp.asarray(offs, dtype=dtype)
