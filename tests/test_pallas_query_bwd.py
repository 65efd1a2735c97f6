"""Gradient parity for the fused point-query backward kernels
(sv3d_tpu/ops/pallas/point_query_bwd.py) against the exact XLA gather path's
autodiff.  bf16 contractions => ~3e-2 relative tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.ops.grid_sample import (
    displacement_axes,
    flatten_grid,
    sample_trilinear_flat,
)
from sv3d_tpu.ops.pallas.point_query import bucket_queries
from sv3d_tpu.ops.pallas.point_query_bwd import level_grad_points, level_grad_vol

RNG = np.random.default_rng(23)


def _xla_feats(vol, p0, p1, p2, disp, ac):
    """(B, 7, N, C) displacement-major features (XLA reference)."""
    b, n = p0.shape
    c = vol.shape[-1]
    flat, dims = flatten_grid(vol)
    pd = displacement_axes((p0, p1, p2), disp)
    f = sample_trilinear_flat(flat, dims, pd, align_corners=ac)  # (B, C, 7N)
    return jnp.moveaxis(f, 1, 2).reshape(b, 7, n, c)


@pytest.mark.parametrize("ac,c", [(False, 16), (True, 4), (False, 1)])
def test_grad_parity_vs_xla(ac, c):
    dims = (19, 13, 14)
    disp = 0.0722 if not ac else 0.035
    b, n = 2, 150
    vol = jnp.asarray(RNG.standard_normal((b, *dims, c), dtype=np.float32))
    pts = RNG.uniform(-1.1, 1.1, (b, n, 3)).astype(np.float32)
    p = [jnp.asarray(pts[..., i]) for i in range(3)]
    probe = jnp.asarray(RNG.standard_normal((b, 7, n, c), dtype=np.float32))

    def loss(vol, p0, p1, p2):
        return jnp.sum(_xla_feats(vol, p0, p1, p2, disp, ac) * probe)

    gv_ref, g0_ref, g1_ref, g2_ref = jax.grad(loss, argnums=(0, 1, 2, 3))(
        vol, p[0], p[1], p[2]
    )

    # kernel grads: map the probe into the bucket-padded (B, P, 7C) layout
    q0, q1, q2, pos, tile_slab, tile_used = bucket_queries(p[0], p[1], p[2], dims[0], ac)
    cap = q0.shape[1]
    g = jnp.zeros((b, cap, 7 * c), jnp.float32)
    probe_n = jnp.moveaxis(probe, 1, 2).reshape(b, n, 7 * c)
    g = jax.vmap(lambda gg, ps, v: gg.at[ps].set(v))(g, pos, probe_n)

    gp = level_grad_points(
        vol, q0, q1, q2, tile_slab, tile_used, g, dims, dims[0], ac, disp,
        interpret=True,
    )
    gp_n = np.take_along_axis(
        np.asarray(gp), np.asarray(pos)[..., None], axis=1
    )
    scale = max(float(jnp.abs(g0_ref).max()), 1.0)
    for axis, ref in enumerate((g0_ref, g1_ref, g2_ref)):
        err = np.abs(gp_n[..., axis] - np.asarray(ref)).max()
        assert err < 4e-2 * max(float(jnp.abs(ref).max()), 1.0), (axis, err)

    gv = level_grad_vol(
        q0, q1, q2, tile_slab, tile_used, g, dims, dims[0], ac, disp,
        interpret=True,
    )
    gv_ref = np.asarray(gv_ref)
    err = np.abs(np.asarray(gv) - gv_ref).max()
    assert err < 4e-2 * max(np.abs(gv_ref).max(), 1.0), err


def test_grad_vol_coarse_level():
    """Coarse level (whole-level window) volume grads."""
    fine, dims, c = 19, (5, 4, 4), 8
    disp, ac = 0.035, True
    vol = jnp.asarray(RNG.standard_normal((1, *dims, c), dtype=np.float32))
    pts = RNG.uniform(-0.9, 0.9, (1, 100, 3)).astype(np.float32)
    p = [jnp.asarray(pts[..., i]) for i in range(3)]
    probe = jnp.asarray(RNG.standard_normal((1, 7, 100, c), dtype=np.float32))

    def loss(vol):
        return jnp.sum(_xla_feats(vol, *p, disp, ac) * probe)

    gv_ref = np.asarray(jax.grad(loss)(vol))

    q0, q1, q2, pos, tile_slab, tile_used = bucket_queries(p[0], p[1], p[2], fine, ac)
    g = jnp.zeros((1, q0.shape[1], 7 * c), jnp.float32)
    probe_n = jnp.moveaxis(probe, 1, 2).reshape(1, 100, 7 * c)
    g = jax.vmap(lambda gg, ps, v: gg.at[ps].set(v))(g, pos, probe_n)
    gv = level_grad_vol(
        q0, q1, q2, tile_slab, tile_used, g, dims, fine, ac, disp,
        interpret=True,
    )
    err = np.abs(np.asarray(gv) - gv_ref).max()
    assert err < 4e-2 * max(np.abs(gv_ref).max(), 1.0), err


def test_ifnet_fused_training_grads():
    """End-to-end: IFNet with fused_query=True produces gradients close to
    the exact XLA path (params + points), so fused training is sound."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    grid = (
        jax.random.uniform(jax.random.PRNGKey(0), (1, 18, 13, 14, 1)) > 0.9
    ).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 64, 3), minval=-0.45, maxval=0.45
    )
    occ = (jax.random.uniform(jax.random.PRNGKey(2), (1, 64)) > 0.5).astype(
        jnp.float32
    )

    def make_loss(fused):
        model = IFNet(IFNetConfig.for_net_res(32, fused_query=fused))

        def loss(variables, pts):
            logits = model.apply(variables, grid, pts, train=False)
            return jnp.mean((jax.nn.sigmoid(logits) - occ) ** 2)

        return model, loss

    m_ref, loss_ref = make_loss(False)
    variables = m_ref.init(jax.random.PRNGKey(3), grid, pts, train=False)
    _, loss_fused = make_loss(True)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(variables, pts)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(variables, pts)

    # mixed-precision mode: gradients must be tightly ALIGNED with the f32
    # path (cosine) and bounded in magnitude error — bf16 compounds through
    # the MLP chain, so elementwise max error is the wrong yardstick
    def cos(a, b):
        a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    ref_p, fused_p = np.asarray(g_ref[1]), np.asarray(g_fused[1])
    assert cos(ref_p, fused_p) > 0.98, cos(ref_p, fused_p)
    assert np.abs(fused_p - ref_p).max() < 0.25 * (np.abs(ref_p).max() + 1e-6)
    rk = np.asarray(g_ref[0]["params"]["fc0_kernel"])
    fk = np.asarray(g_fused[0]["params"]["fc0_kernel"])
    assert cos(rk, fk) > 0.98, cos(rk, fk)
    assert np.abs(fk - rk).max() < 0.25 * (np.abs(rk).max() + 1e-6)
