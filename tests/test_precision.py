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
