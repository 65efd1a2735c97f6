"""Op parity tests: trilinear grid sampling vs torch.nn.functional.grid_sample
(CPU torch is a test-only dependency), scatter voxelization vs a numpy
re-derivation of the reference algorithm, and gradient checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from sv3d_tpu.ops import (
    gaussian_kernels_1d,
    sample_trilinear,
    scatter_voxels,
    smooth_voxels,
    voxelize,
)
from sv3d_tpu.ops.grid_sample import displacement_axes


def _torch_grid_sample(grid_ours, points_ours, align_corners):
    """Run torch grid_sample with our conventions mapped to torch's.

    ours: grid (B, G0, G1, G2, C), points (B, N, 3) with points[..., i]
    addressing axis i; output channel-major (B, C, N).  torch: input
    (B, C, D, H, W), grid (..., 3) ordered (x=W, y=H, z=D) — i.e. reversed."""
    t_in = torch.from_numpy(np.moveaxis(grid_ours, -1, 1).copy())
    t_pts = torch.from_numpy(points_ours[..., ::-1].copy())[:, None, None]  # (B,1,1,N,3)
    out = F.grid_sample(t_in, t_pts, align_corners=align_corners)  # (B,C,1,1,N)
    return out[:, :, 0, 0].numpy()  # (B, C, N)


@pytest.mark.parametrize("align_corners", [True, False])
def test_sample_trilinear_matches_torch(align_corners, rng):
    b, g0, g1, g2, c, n = 2, 7, 6, 5, 3, 400
    grid = rng.standard_normal((b, g0, g1, g2, c)).astype(np.float32)
    # include points beyond the border to exercise zero padding
    pts = rng.uniform(-1.3, 1.3, size=(b, n, 3)).astype(np.float32)
    ours = np.asarray(sample_trilinear(jnp.asarray(grid), jnp.asarray(pts), align_corners))
    ref = _torch_grid_sample(grid, pts, align_corners)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_sample_trilinear_exact_voxel_centers(rng):
    """align_corners=True at integer lattice points returns exact grid values."""
    g = rng.standard_normal((1, 4, 5, 6, 2)).astype(np.float32)
    idx = np.stack(np.meshgrid(np.arange(4), np.arange(5), np.arange(6), indexing="ij"), -1)
    idx = idx.reshape(1, -1, 3).astype(np.float32)
    sizes = np.array([4, 5, 6], dtype=np.float32)
    pts = idx / (sizes - 1) * 2 - 1
    out = np.asarray(sample_trilinear(jnp.asarray(g), jnp.asarray(pts), True))
    out = np.moveaxis(out, 1, -1)  # (B, N, C)
    np.testing.assert_allclose(out.reshape(4, 5, 6, 2), g[0], rtol=1e-5, atol=1e-5)


def test_sample_trilinear_grad_flows_to_points(rng):
    grid = jnp.asarray(rng.standard_normal((1, 5, 5, 5, 2)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, size=(1, 10, 3)).astype(np.float32))

    def loss(p, g):
        return jnp.sum(sample_trilinear(g, p, False) ** 2)

    gp = jax.grad(loss)(pts, grid)
    assert np.isfinite(np.asarray(gp)).all()
    assert np.abs(np.asarray(gp)).max() > 0
    # finite difference check on one coordinate
    e = 1e-3
    d = jnp.zeros_like(pts).at[0, 3, 1].set(e)
    fd = (loss(pts + d, grid) - loss(pts - d, grid)) / (2 * e)
    np.testing.assert_allclose(float(gp[0, 3, 1]), float(fd), rtol=2e-2, atol=2e-3)


def _reference_pc_voxels(points, dims, eps=1e-6):
    """Numpy re-derivation of reference model/projection.py:39-80."""
    b, n, _ = points.shape
    out = np.zeros((b, *dims), dtype=np.float64)
    sizes = np.array(dims, dtype=np.float64)
    for bi in range(b):
        for pi in range(n):
            p = points[bi, pi]
            if not np.all((p < 0.5 - eps) & (p > -0.5 + eps)):
                continue
            g = (p + 0.5) * (sizes - 1)
            g0 = np.floor(g).astype(int)
            r = g - g0
            for c0 in (0, 1):
                for c1 in (0, 1):
                    for c2 in (0, 1):
                        w = (r[0] if c0 else 1 - r[0]) * (r[1] if c1 else 1 - r[1]) * (
                            r[2] if c2 else 1 - r[2]
                        )
                        out[bi, g0[0] + c0, g0[1] + c1, g0[2] + c2] += w
    return np.clip(out, 0, 1)


def test_scatter_voxels_matches_reference(rng):
    dims = (9, 8, 7)
    pts = rng.uniform(-0.6, 0.6, size=(2, 200, 3)).astype(np.float32)
    ours = np.asarray(scatter_voxels(jnp.asarray(pts), dims))
    ref = _reference_pc_voxels(pts, dims)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_scatter_voxels_mass_conservation(rng):
    """Without the clamp each in-range point contributes total weight 1."""
    dims = (16, 16, 16)
    pts = rng.uniform(-0.4, 0.4, size=(1, 50, 3)).astype(np.float32)
    vox = np.asarray(scatter_voxels(jnp.asarray(pts), dims))
    # with only 50 points in 4096 voxels collisions are rare -> sum ~= 50
    assert vox.sum() == pytest.approx(50.0, abs=0.5)


def test_scatter_voxels_grad(rng):
    dims = (6, 6, 6)
    pts = jnp.asarray(rng.uniform(-0.4, 0.4, size=(1, 20, 3)).astype(np.float32))

    def loss(p):
        return jnp.sum(scatter_voxels(p, dims) ** 2)

    g = jax.grad(loss)(pts)
    assert np.isfinite(np.asarray(g)).all()
    e = 1e-3
    d = jnp.zeros_like(pts).at[0, 5, 2].set(e)
    fd = (loss(pts + d) - loss(pts - d)) / (2 * e)
    np.testing.assert_allclose(float(g[0, 5, 2]), float(fd), rtol=5e-2, atol=5e-3)


def test_gaussian_kernels():
    sigma = jnp.asarray([1.5, 1.0, 0.5])
    ks = gaussian_kernels_1d(sigma, (3, 3, 5))
    assert [k.shape[0] for k in ks] == [3, 3, 5]
    for k in ks:
        assert float(jnp.sum(k)) == pytest.approx(1.0, rel=1e-6)
    # matches the explicit formula exp(-x^2 / 2 sigma^2), normalized
    x = np.array([-1, 0, 1], dtype=np.float32)
    expect = np.exp(-(x**2) / (2 * 1.5**2))
    np.testing.assert_allclose(np.asarray(ks[0]), expect / expect.sum(), rtol=1e-5)


def test_smooth_voxels_vs_torch_conv(rng):
    vox = rng.random((2, 10, 9, 8)).astype(np.float32)
    sigma = jnp.asarray([1.5, 1.5, 1.5])
    ks = gaussian_kernels_1d(sigma, (3, 3, 3))
    ours = np.asarray(smooth_voxels(jnp.asarray(vox), ks))

    t = torch.from_numpy(vox)[None]  # (1, B, D, H, W) — torch groups trick not needed, use C=B? no:
    t = torch.from_numpy(vox)[:, None]  # (B, 1, D, H, W)
    for axis, k in enumerate(ks):
        kn = np.asarray(k)
        shape = [1, 1, 1, 1, 1]
        shape[axis + 2] = len(kn)
        w = torch.from_numpy(kn.reshape(shape).astype(np.float32))
        pad = [0, 0, 0]
        pad[axis] = len(kn) // 2
        t = torch.nn.functional.conv3d(t, w, padding=pad)
    ref = np.clip(t[:, 0].numpy(), 0, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_smooth_sigma_grad(rng):
    """Sigma is learnable in the reference (projection.py:26-27); the gradient
    must flow through the kernel construction."""
    vox = jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))
    tgt = jnp.asarray(rng.random((1, 8, 8, 8)).astype(np.float32))

    def loss(sigma):
        return jnp.mean((smooth_voxels(vox, gaussian_kernels_1d(sigma, (3, 3, 3))) - tgt) ** 2)

    g = jax.grad(loss)(jnp.asarray([1.5, 1.5, 1.5]))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_voxelize_full(rng):
    pts = jnp.asarray(rng.uniform(-0.45, 0.45, size=(2, 100, 3)).astype(np.float32))
    out = voxelize(pts, (12, 10, 8), jnp.asarray([1.5, 1.5, 1.5]), (3, 3, 3))
    assert out.shape == (2, 12, 10, 8, 1)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_displacement_axes(rng):
    p = [jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32)) for _ in range(3)]
    d0, d1, d2 = displacement_axes(tuple(p), 0.0722)
    assert d0.shape == (2, 35)
    # copy 0 = center
    for a, orig in zip((d0, d1, d2), p):
        np.testing.assert_allclose(np.asarray(a[:, :5]), np.asarray(orig))
    # copies 1,2 displace axis 0 only
    np.testing.assert_allclose(np.asarray(d0[:, 5:10]), np.asarray(p[0]) - 0.0722, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d0[:, 10:15]), np.asarray(p[0]) + 0.0722, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1[:, 5:15]), np.tile(np.asarray(p[1]), (1, 2)))
    # copies 3,4 displace axis 1 only
    np.testing.assert_allclose(np.asarray(d1[:, 15:20]), np.asarray(p[1]) - 0.0722, rtol=1e-5)
    # copies 5,6 displace axis 2 only
    np.testing.assert_allclose(np.asarray(d2[:, 30:35]), np.asarray(p[2]) + 0.0722, rtol=1e-5)


def test_smooth_voxels_matches_conv_reference():
    """The banded-matmul blur must equal the direct 1-D convolution
    formulation (reference model/projection.py:102-117) to float32 accuracy,
    including even kernel sizes and gradients through sigma."""
    import jax

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((2, 9, 7, 8)), dtype=jnp.float32)

    def conv_blur(vox, kernels):
        y = vox[..., None]
        for axis, kern in enumerate(kernels):
            k = kern.shape[0]
            shape = [1, 1, 1, 1, 1]
            shape[axis] = k
            rhs = kern.reshape(shape).astype(y.dtype)
            pad = [(0, 0)] * 3
            pad[axis] = (k // 2, (k - 1) // 2)
            y = jax.lax.conv_general_dilated(
                y, rhs, (1, 1, 1), pad,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
        return jnp.clip(y[..., 0], 0.0, 1.0)

    for ks in ((3, 3, 3), (5, 3, 4)):
        sigma = jnp.asarray([1.5, 0.9, 1.2])
        kernels = gaussian_kernels_1d(sigma, ks)
        np.testing.assert_allclose(
            np.asarray(smooth_voxels(x, kernels)),
            np.asarray(conv_blur(x, kernels)),
            rtol=1e-6, atol=1e-6,
        )

    # gradient w.r.t. sigma flows through the banded matrices
    def loss(sigma):
        return jnp.sum(smooth_voxels(x, gaussian_kernels_1d(sigma, (3, 3, 3))))

    g = jax.grad(loss)(jnp.asarray([1.5, 1.5, 1.5]))
    assert np.all(np.isfinite(np.asarray(g))) and np.any(np.asarray(g) != 0)
