"""Parity + gradient tests for the fused Pallas voxelization
(sv3d_tpu/ops/pallas/voxelize.py) against the XLA scatter path
(sv3d_tpu/ops/voxelize.py).  The kernel contracts at HIGHEST precision, so
parity is float32-tight."""

import jax
import jax.numpy as jnp
import numpy as np

from sv3d_tpu.ops.pallas.voxelize import scatter_voxels_pallas
from sv3d_tpu.ops.voxelize import scatter_voxels

RNG = np.random.default_rng(11)
DIMS = (19, 13, 14)


def test_scatter_parity_including_border_drops():
    pts = RNG.uniform(-0.7, 0.7, (2, 3000, 3)).astype(np.float32)
    ref = np.asarray(scatter_voxels(jnp.asarray(pts), DIMS))
    got = np.asarray(scatter_voxels_pallas(jnp.asarray(pts), DIMS, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_scatter_single_point_exact_weights():
    pts = np.array([[[0.1234, -0.2345, 0.3456]]], np.float32)
    got = np.asarray(scatter_voxels_pallas(jnp.asarray(pts), DIMS, interpret=True))
    ix = [(pts[0, 0, a] + 0.5) * (DIMS[a] - 1.0) for a in range(3)]
    i = [int(np.floor(x)) for x in ix]
    f = [float(x - np.floor(x)) for x in ix]
    for c0 in (0, 1):
        for c1 in (0, 1):
            for c2 in (0, 1):
                w = (
                    (f[0] if c0 else 1 - f[0])
                    * (f[1] if c1 else 1 - f[1])
                    * (f[2] if c2 else 1 - f[2])
                )
                np.testing.assert_allclose(
                    got[0, i[0] + c0, i[1] + c1, i[2] + c2], w, atol=1e-6
                )
    np.testing.assert_allclose(got.sum(), 1.0, atol=1e-6)


def test_scatter_gradients_match_xla_path():
    pts = jnp.asarray(RNG.uniform(-0.6, 0.6, (2, 800, 3)).astype(np.float32))
    probe = jnp.cos(jnp.arange(np.prod(DIMS), dtype=jnp.float32)).reshape(DIMS)

    g_ref = jax.grad(lambda p: jnp.sum(scatter_voxels(p, DIMS) * probe))(pts)
    g_new = jax.grad(
        lambda p: jnp.sum(scatter_voxels_pallas(p, DIMS, interpret=True) * probe)
    )(pts)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-4)


def test_projection_module_pallas_path():
    """Projection with use_pallas=True (interpret on CPU) matches the XLA
    module output, gradients included (learnable sigma + points)."""
    from sv3d_tpu.config import ProjectionConfig
    from sv3d_tpu.models.projection import Projection

    cfg = ProjectionConfig(dims=DIMS)
    pts = jnp.asarray(RNG.uniform(-0.45, 0.45, (1, 500, 3)).astype(np.float32))
    m_x = Projection(cfg, use_pallas=False)
    m_p = Projection(cfg, use_pallas=True)
    v = m_x.init(jax.random.PRNGKey(0), pts)

    out_x = m_x.apply(v, pts)
    out_p = m_p.apply(v, pts)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=2e-6)

    def loss(fn):
        return lambda v, p: jnp.sum(fn.apply(v, p) ** 2)

    gx = jax.grad(loss(m_x), argnums=(0, 1))(v, pts)
    gp = jax.grad(loss(m_p), argnums=(0, 1))(v, pts)
    np.testing.assert_allclose(
        np.asarray(gp[0]["params"]["sigma"]),
        np.asarray(gx[0]["params"]["sigma"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-4)
