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

    # per-axis index math on (B, N) arrays — (B, N, 3) intermediates would be
    # lane-padded 42x by the TPU (8, 128) tile layout
    axes = []
    valid = None
    for a, size in ((0, d0), (1, d1), (2, d2)):
        p = points[..., a]
        va = (p < 0.5 - eps) & (p > -0.5 + eps)
        valid = va if valid is None else (valid & va)
        # continuous voxel coords in [0, size-1] (reference model/projection.py:46)
        g = (p + 0.5) * (size - 1.0)
        gf = jnp.floor(g)
        axes.append((gf.astype(jnp.int32), g - gf))

    (i0, f0), (i1, f1), (i2, f2) = axes
    nflat = d0 * d1 * d2
    b = points.shape[0]
    vox = jnp.zeros((b, nflat), dtype=points.dtype)
    for c0 in (0, 1):
        w0 = f0 if c0 else 1.0 - f0
        l0 = i0 + c0
        for c1 in (0, 1):
            w01 = w0 * (f1 if c1 else 1.0 - f1)
            l01 = l0 * d1 + (i1 + c1)
            for c2 in (0, 1):
                w = jnp.where(valid, w01 * (f2 if c2 else 1.0 - f2), 0.0)
                lin = jnp.where(valid, l01 * d2 + (i2 + c2), 0)
                vox = jax.vmap(lambda v, l, ww: v.at[l].add(ww))(vox, lin, w)
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


def blur_matrix(kern: jnp.ndarray, size: int) -> jnp.ndarray:
    """(size, size) banded matrix applying a 1-D cross-correlation with SAME
    zero padding: out[i] = sum_t kern[t] * x[i + t - k//2].  Built from
    shifted identities so it stays differentiable in kern (hence in the
    learnable sigma)."""
    k = kern.shape[0]
    m = jnp.zeros((size, size), dtype=kern.dtype)
    for t in range(k):
        m = m + kern[t] * jnp.eye(size, size, k=t - k // 2, dtype=kern.dtype)
    return m


def smooth_voxels(voxels: jnp.ndarray, kernels: list) -> jnp.ndarray:
    """Separable 3-D Gaussian blur: one banded-matrix contraction per grid
    axis (reference model/projection.py:102-117 uses three 1-D convs).

    TPU note: XLA's conv with C=1 NDHWC lane-pads activations and measured
    ~57 ms per train step at B=8; the same math as three (D, D) banded
    matmuls runs on the MXU in ~1 ms.  HIGHEST precision — default precision
    lowers matmul operands to bf16 on TPU/CPU, which visibly perturbs the
    occupancy density field.

    voxels: (B, D0, D1, D2) -> same shape, clamped to [0, 1].
    """
    x = voxels
    hi = jax.lax.Precision.HIGHEST
    m0, m1, m2 = (
        blur_matrix(kern.astype(x.dtype), x.shape[1 + axis])
        for axis, kern in enumerate(kernels)
    )
    x = jnp.einsum("ij,bjkl->bikl", m0, x, precision=hi)
    x = jnp.einsum("ij,bkjl->bkil", m1, x, precision=hi)
    x = jnp.einsum("ij,bklj->bkli", m2, x, precision=hi)
    return jnp.clip(x, 0.0, 1.0)


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
