"""Mixed-precision (--precision 16 -> bf16 compute) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sv3d_tpu.config import Config, IFNetConfig
from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.models.unet import UNetMini


def test_unet_bf16_compute_f32_params():
    model = UNetMini(channels_out=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 240, 320, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    # params stay f32 (mixed precision)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(v["params"]))
    y = model.apply(v, x, train=False)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, dtype=np.float32)).all()


def test_ifnet_bf16_close_to_f32():
    cfg = IFNetConfig.for_net_res(32)
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (1, 8, 8, 8, 1))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 3), minval=-0.4, maxval=0.4)

    m32 = IFNet(cfg)
    v = m32.init(key, grid, pts, train=False)
    out32 = m32.apply(v, grid, pts, train=False)

    m16 = IFNet(cfg, dtype=jnp.bfloat16)
    out16 = m16.apply(v, grid, pts, train=False)
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), rtol=0.1, atol=0.1
    )


def test_config_precision_dtype():
    assert Config(precision=32).dtype == jnp.float32
    assert Config(precision=16).dtype == jnp.bfloat16


def test_fused_query_accepts_bf16_pyramid():
    """precision=16 + fused_query (bf16 encoder convs, f32 kernel interface):
    query_fused casts a bf16 pyramid back to f32 at its boundary, so forward
    AND gradients flow — the combination Config used to reject (VERDICT r2
    item 7's lever: bf16 conv compute with f32 BN/loss/kernel-interface)."""
    grid = (
        jax.random.uniform(jax.random.PRNGKey(0), (1, 18, 13, 14, 1)) > 0.9
    ).astype(jnp.float32)
    pts = jax.random.uniform(
        jax.random.PRNGKey(1), (1, 64, 3), minval=-0.45, maxval=0.45
    )
    occ = (jax.random.uniform(jax.random.PRNGKey(2), (1, 64)) > 0.5).astype(
        jnp.float32
    )

    cfg = IFNetConfig.for_net_res(32, fused_query=True)
    m32 = IFNet(cfg)
    variables = m32.init(jax.random.PRNGKey(3), grid, pts, train=False)
    m16 = IFNet(cfg, dtype=jnp.bfloat16)

    def make_loss(model):
        def loss(v, p):
            logits = model.apply(v, grid, p, train=False)
            return jnp.mean((jax.nn.sigmoid(logits) - occ) ** 2)

        return loss

    l32, l16 = make_loss(m32), make_loss(m16)
    out32 = l32(variables, pts)
    out16 = l16(variables, pts)
    assert np.isfinite(float(out16))
    np.testing.assert_allclose(float(out16), float(out32), rtol=0.05, atol=0.01)

    g32 = jax.grad(l32, argnums=(0, 1))(variables, pts)
    g16 = jax.grad(l16, argnums=(0, 1))(variables, pts)

    def cos(a, b):
        a, b = np.asarray(a, np.float32).ravel(), np.asarray(b, np.float32).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    # conv-param grads come back through the bf16 cast; they must stay f32
    # (params are f32), finite, and aligned with the all-f32 fused path
    for key in ("fc0_kernel",):
        rk = np.asarray(g32[0]["params"][key])
        fk = np.asarray(g16[0]["params"][key], np.float32)
        assert np.isfinite(fk).all()
        assert cos(rk, fk) > 0.95, cos(rk, fk)
    leaves16 = jax.tree.leaves(g16[0]["params"])
    assert all(l.dtype == jnp.float32 for l in leaves16)
    assert cos(g32[1], g16[1]) > 0.95, cos(g32[1], g16[1])


def test_config_allows_fused_query_with_precision_16():
    cfg = Config(precision=16, fused_query=True)
    assert cfg.dtype == jnp.bfloat16
