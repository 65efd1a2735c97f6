"""Differentiable point-cloud voxelization + separable Gaussian smoothing.

TPU-native rebuild of the reference's diff-voxelization (model/projection.py:
39-117): each point is trilinearly scatter-added into its 8 neighbouring
voxels (XLA scatter-add, deterministic on TPU), the resulting density is
clamped to [0, 1], then blurred with three 1-D Gaussian convolutions whose
per-axis sigma is a learnable parameter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_voxels(points: jnp.ndarray, dims: tuple, eps: float = 1e-6) -> jnp.ndarray:
    """Trilinear scatter of points into a voxel occupancy grid.

    Args:
      points: (B, N, 3) in normed grid space [-0.5, 0.5]^3 (points[..., i]
        addresses grid axis i).
      dims: static (D0, D1, D2) grid shape.
      eps: border epsilon — points outside (-0.5+eps, 0.5-eps) on any axis are
        dropped (reference model/projection.py:44).

    Returns:
      (B, D0, D1, D2) float grid, clamped to [0, 1].  Differentiable in points.
    """
    d0, d1, d2 = (int(d) for d in dims)
    sizes = jnp.asarray([d0, d1, d2], dtype=points.dtype)

    valid = jnp.all((points < 0.5 - eps) & (points > -0.5 + eps), axis=-1)
    # continuous voxel coords in [0, dims-1] (reference model/projection.py:46)
    grid = (points + 0.5) * (sizes - 1.0)
    gf = jnp.floor(grid)
    frac = grid - gf
    i0 = gf.astype(jnp.int32)

    nflat = d0 * d1 * d2

    def scatter_one(i0_s, frac_s, valid_s):
        vox = jnp.zeros((nflat,), dtype=points.dtype)
        for c0 in (0, 1):
            for c1 in (0, 1):
                for c2 in (0, 1):
                    idx = i0_s + jnp.asarray([c0, c1, c2], dtype=jnp.int32)
                    w = (
                        (frac_s[:, 0] if c0 else 1.0 - frac_s[:, 0])
                        * (frac_s[:, 1] if c1 else 1.0 - frac_s[:, 1])
                        * (frac_s[:, 2] if c2 else 1.0 - frac_s[:, 2])
                    )
                    w = jnp.where(valid_s, w, 0.0)
                    lin = (idx[:, 0] * d1 + idx[:, 1]) * d2 + idx[:, 2]
                    lin = jnp.where(valid_s, lin, 0)
                    vox = vox.at[lin].add(w)
        return vox

    vox = jax.vmap(scatter_one)(i0, frac, valid)
    return jnp.clip(vox.reshape(-1, d0, d1, d2), 0.0, 1.0)


def gaussian_kernels_1d(sigma: jnp.ndarray, kernel_size: tuple) -> list:
    """Three normalized 1-D Gaussian kernels with per-axis (learnable) sigma
    (reference model/projection.py:82-100)."""
    kernels = []
    for axis in range(3):
        k = int(kernel_size[axis])
        x = jnp.arange(-(k // 2) + 1.0 if k % 2 == 0 else -(k // 2), k // 2 + 1.0)
        x = x.astype(sigma.dtype)
        kern = jnp.exp(-(x**2) / (2.0 * sigma[axis] ** 2))
        kernels.append(kern / jnp.sum(kern))
    return kernels


def smooth_voxels(voxels: jnp.ndarray, kernels: list) -> jnp.ndarray:
    """Separable 3-D Gaussian blur: one 1-D conv per grid axis
    (reference model/projection.py:102-117).

    voxels: (B, D0, D1, D2) -> same shape, clamped to [0, 1].
    """
    x = voxels[..., None]  # NDHWC with C=1
    for axis, kern in enumerate(kernels):
        k = kern.shape[0]
        shape = [1, 1, 1, 1, 1]
        shape[axis] = k
        rhs = kern.reshape(shape).astype(x.dtype)  # (k?,1?,1?, in=1, out=1)
        pad = [(0, 0)] * 3
        pad[axis] = (k // 2, (k - 1) // 2)
        x = jax.lax.conv_general_dilated(
            x,
            rhs,
            window_strides=(1, 1, 1),
            padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
    return jnp.clip(x[..., 0], 0.0, 1.0)


def voxelize(
    points: jnp.ndarray, dims: tuple, sigma: jnp.ndarray, kernel_size: tuple
) -> jnp.ndarray:
    """Full differentiable voxelization: scatter + learnable Gaussian smoothing
    (reference model/projection.py:119-122).

    Returns (B, D0, D1, D2, 1) channels-last occupancy grid.
    """
    vox = scatter_voxels(points, dims)
    smoothed = smooth_voxels(vox, gaussian_kernels_1d(sigma, kernel_size))
    return smoothed[..., None]
