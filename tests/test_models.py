"""Model tests: shapes, parameter counts, batch-norm state, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.config import Config, IFNetConfig, ProjectionConfig
from sv3d_tpu.geometry import FrustumGrid, read_intrinsics
from sv3d_tpu.models import IFNet, Projection, SceneNet, UNet, UNetMini


@pytest.fixture(scope="module")
def small_rng_key():
    return jax.random.PRNGKey(0)


def test_unet_shapes(small_rng_key):
    model = UNet(channels_out=1)
    x = jnp.zeros((1, 256, 256, 3))
    variables = model.init(small_rng_key, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 256, 256, 1)
    assert "batch_stats" in variables


def test_unet_mini_shapes(small_rng_key):
    model = UNetMini(channels_out=1)
    x = jnp.zeros((1, 240, 320, 3))
    variables = model.init(small_rng_key, x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 240, 320, 1)
    # train mode must update batch stats
    y2, mutated = model.apply(
        variables, jnp.ones((2, 240, 320, 3)), train=True, mutable=["batch_stats"]
    )
    assert y2.shape == (2, 240, 320, 1)
    assert "batch_stats" in mutated


@pytest.mark.parametrize("net_res,expected_feat", [(128, 2583), (32, 2247)])
def test_ifnet_feature_size(net_res, expected_feat):
    cfg = IFNetConfig.for_net_res(net_res)
    model = IFNet(cfg)
    # feature sizes match reference model/ifnet.py:18,26
    assert sum(cfg.feature_channels) * 7 == expected_feat


@pytest.mark.parametrize("net_res", [128, 32])
def test_ifnet_forward(net_res, small_rng_key):
    cfg = IFNetConfig.for_net_res(net_res)
    model = IFNet(cfg)
    grid = jnp.zeros((2, 16, 16, 16, 1))
    pts = jax.random.uniform(small_rng_key, (2, 50, 3), minval=-0.5, maxval=0.5)
    variables = model.init(small_rng_key, grid, pts, train=False)
    logits = model.apply(variables, grid, pts, train=False)
    assert logits.shape == (2, 50)
    assert np.isfinite(np.asarray(logits)).all()


def test_ifnet_encode_query_equals_call(small_rng_key):
    """encode()+query() must equal __call__ — the encode-once inference path
    (fixing reference model/ifnet.py:222-225 recomputation) is lossless."""
    cfg = IFNetConfig.for_net_res(32)
    model = IFNet(cfg)
    grid = jax.random.normal(small_rng_key, (1, 8, 8, 8, 1))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 20, 3), minval=-0.4, maxval=0.4)
    variables = model.init(small_rng_key, grid, pts, train=False)
    full = model.apply(variables, grid, pts, train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    split = model.apply(variables, levels, pts, method=IFNet.query)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), rtol=1e-5, atol=1e-6)


def test_projection_learnable_sigma(small_rng_key):
    cfg = ProjectionConfig(dims=(10, 9, 8))
    model = Projection(cfg)
    pc = jax.random.uniform(small_rng_key, (2, 100, 3), minval=-0.45, maxval=0.45)
    variables = model.init(small_rng_key, pc)
    assert variables["params"]["sigma"].shape == (3,)
    out = model.apply(variables, pc)
    assert out.shape == (2, 10, 9, 8, 1)

    def loss(params):
        return jnp.sum(model.apply({"params": params}, pc) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert np.abs(np.asarray(g["sigma"])).max() > 0


@pytest.fixture(scope="module")
def scene_cfg():
    return Config(scale_factor=4, num_points=16, batch_size=1)


def test_scene_net_forward(scene_cfg, fixture_dir, small_rng_key):
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    frustum = FrustumGrid.create(intr, voxel_size=0.05 * scene_cfg.scale_factor)
    assert frustum.dims == scene_cfg.dims
    model = SceneNet(scene_cfg, intr, frustum)
    rgb = jnp.zeros((1, 240, 320, 3))
    depth_t = jnp.full((1, 240, 320), 2.0)
    pts = jax.random.uniform(small_rng_key, (1, 32, 3), minval=-0.5, maxval=0.5)
    variables = model.init(small_rng_key, rgb, depth_t, pts, train=False)
    logits, depth, pc = model.apply(variables, rgb, depth_t, pts, train=False)
    assert logits.shape == (1, 32)
    assert depth.shape == (1, 240, 320)
    assert pc.shape == (1, 240 * 320, 3)
    # predicted depth respects the renormalization range
    assert float(depth.min()) >= scene_cfg.min_z
    assert float(depth.max()) <= scene_cfg.max_z


def test_scene_net_skip_unet(scene_cfg, fixture_dir, small_rng_key):
    cfg = scene_cfg.replace(skip_unet=True)
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    frustum = FrustumGrid.create(intr, voxel_size=0.05 * cfg.scale_factor)
    model = SceneNet(cfg, intr, frustum)
    depth_t = jnp.full((1, 240, 320), 2.0)
    pts = jnp.zeros((1, 8, 3))
    variables = model.init(small_rng_key, None, depth_t, pts, train=False)
    logits, depth, _ = model.apply(variables, None, depth_t, pts, train=False)
    assert logits.shape == (1, 8)
    np.testing.assert_allclose(np.asarray(depth), 2.0)
    # no unet params created
    assert "unet" not in variables["params"]


def test_scene_net_subsample(scene_cfg, fixture_dir, small_rng_key):
    cfg = scene_cfg.replace(subsample_points=64, skip_unet=True)
    intr = read_intrinsics(fixture_dir / "intrinsic.txt")
    frustum = FrustumGrid.create(intr, voxel_size=0.05 * cfg.scale_factor)
    model = SceneNet(cfg, intr, frustum)
    depth_t = jnp.full((1, 240, 320), 2.0)
    pts = jnp.zeros((1, 8, 3))
    variables = model.init(
        small_rng_key, None, depth_t, pts, train=False,
        subsample_rng=jax.random.PRNGKey(1),
    )
    logits, _, pc = model.apply(
        variables, None, depth_t, pts, train=False,
        subsample_rng=jax.random.PRNGKey(2),
    )
    # 64 projected + 8 supervision points
    assert logits.shape == (1, 72)
    assert pc.shape == (1, 64, 3)
