"""Inference module API tests: dense sweeps, arbitrary points, meshing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.config import IFNetConfig
from sv3d_tpu.geometry.transforms import make_3d_grid
from sv3d_tpu.inference.dense_grid import (
    evaluate_on_grid,
    evaluate_on_grid_device,
    evaluate_points,
    implicit_to_mesh,
)
from sv3d_tpu.models.ifnet import IFNet


@pytest.fixture(scope="module")
def small_model():
    model = IFNet(IFNetConfig.for_net_res(32))
    key = jax.random.PRNGKey(0)
    dims = (10, 9, 8)
    grid = (jax.random.uniform(key, (1, *dims, 1)) > 0.9).astype(jnp.float32)
    variables = model.init(key, grid, jnp.zeros((1, 8, 3)), train=False)
    return model, variables, grid, dims


def test_evaluate_on_grid_shape_and_range(small_model):
    model, variables, grid, dims = small_model
    out = evaluate_on_grid(model, variables, grid, dims, res_increase=1, slab_rows=4)
    assert out.shape == dims
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_evaluate_on_grid_device_matches_host(small_model):
    model, variables, grid, dims = small_model
    host = evaluate_on_grid(
        model, variables, grid, dims, slab_rows=4, transfer_dtype=None
    )
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)
    dev = np.asarray(
        evaluate_on_grid_device(model, variables, levels, dims, slab_rows=4)
    )[: dims[0]]
    np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-6)
    # the default f32 transfer is exact
    f32 = evaluate_on_grid(model, variables, grid, dims, slab_rows=4)
    np.testing.assert_allclose(f32, host, rtol=0, atol=0)
    # opt-in f16 device->host transfer quantizes the sigmoid field by at
    # most ~2.5e-4 (f16 eps at 0.5 is 4.9e-4, round-to-nearest halves it)
    f16 = evaluate_on_grid(
        model, variables, grid, dims, slab_rows=4, transfer_dtype=jnp.float16
    )
    np.testing.assert_allclose(f16, host, atol=5e-4)
    # opt-in uint8 fixed-point transfer (quarter bytes): x/255 resolves the
    # field to 1/510, and the return contract stays float32 in [0, 1]
    u8 = evaluate_on_grid(
        model, variables, grid, dims, slab_rows=4, transfer_dtype=jnp.uint8
    )
    assert u8.dtype == np.float32
    assert 0.0 <= u8.min() and u8.max() <= 1.0
    np.testing.assert_allclose(u8, host, atol=1.0 / 510 + 1e-6)


def test_evaluate_points_matches_grid_on_lattice(small_model):
    """Arbitrary-point (gather) evaluation at the lattice points must agree
    with the lattice sweep (bf16 resize tolerance)."""
    model, variables, grid, dims = small_model
    lattice = evaluate_on_grid(model, variables, grid, dims, slab_rows=4)
    pts = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, dims))
    vals = evaluate_points(model, variables, grid, pts, tile_points=256)
    np.testing.assert_allclose(vals.reshape(dims), lattice, rtol=5e-2, atol=1e-2)


def test_evaluate_points_banded_fused_matches_gathers(small_model):
    """use_pallas + bands=: the 2-D bucketed fused kernel (interpret mode on
    CPU) agrees with the exact gather path at API level."""
    model, variables, grid, dims = small_model
    pts = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, dims))
    exact = evaluate_points(
        model, variables, grid, pts, tile_points=256, use_pallas=False
    )
    banded = evaluate_points(
        model, variables, grid, pts, tile_points=256, use_pallas=True, bands=4
    )
    np.testing.assert_allclose(banded, exact, rtol=5e-2, atol=1e-2)
    # bands="auto" resolves via the cost model and stays correct
    auto = evaluate_points(
        model, variables, grid, pts, tile_points=256, use_pallas=True,
        bands="auto",
    )
    np.testing.assert_allclose(auto, exact, rtol=5e-2, atol=1e-2)


def test_choose_bands_tracks_time_model():
    """The packaged cost model picks the hardware-measured optima
    (ARCHITECTURE §9: measured 60.9 ms at bands=16 vs 86.4 ms 1-D at 262k
    full-dims queries) and degrades to the 1-D path on tiny grids /
    tiny query counts."""
    from sv3d_tpu.config import Config
    from sv3d_tpu.ops.pallas.cost import (
        choose_bands,
        issued_flops_per_point,
        predicted_sec_per_point,
    )

    top = Config(net_res=128, scale_factor=1)
    cfg, dims = top.ifnet(), tuple(top.dims)
    assert choose_bands(cfg, dims, n=262144) == 16
    # the pick actually minimizes the model it claims to minimize
    times = {
        b: predicted_sec_per_point(cfg, dims, b, n=262144)
        for b in (0, 4, 8, 12, 16, 24, 32)
    }
    assert min(times, key=times.get) == 16
    # the time model reproduces the measured hardware ordering
    # (bands_sweep 2026-08-19: 16 < 12 < 8 < 24 < 4 < 1-D), which the raw
    # issued-FLOP model got wrong (it ranks 8 below 16)
    assert times[16] < times[12] < times[8] < times[24] < times[4] < times[0]
    # banded still cuts the 1-D ISSUED work by >2x at full dims
    flops = {
        b: issued_flops_per_point(cfg, dims, b, n=262144) for b in (0, 8)
    }
    assert flops[0] / flops[8] > 2.0
    # fewer queries -> pad amortization shifts the optimum
    assert choose_bands(cfg, dims, n=65536) == 12
    half = Config(net_res=128, scale_factor=2)
    assert choose_bands(half.ifnet(), tuple(half.dims), n=262144) == 4
    # tiny query counts: the fixed overhead dominates, 1-D wins
    assert choose_bands(cfg, dims, n=4096) is None
    tiny = Config(net_res=128, scale_factor=8)
    assert choose_bands(tiny.ifnet(), tuple(tiny.dims), n=262144) is None


def test_evaluate_points_sharded(small_model):
    import os

    if os.environ.get("SV3D_SLOW_TESTS", "0") != "1":
        # SPMD-partitioning this unrolled gather graph compiles for >40 min on
        # the 1-core host; the equivalent sharded-query parity is covered by
        # tests/test_parallel.py::test_point_sharded_ifnet_query_matches_replicated
        pytest.skip("slow SPMD compile; set SV3D_SLOW_TESTS=1 to run")
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from sv3d_tpu.parallel.mesh import make_mesh

    model, variables, grid, dims = small_model
    mesh = make_mesh(dp=1, sp=8)
    pts = np.asarray(make_3d_grid((-0.5,) * 3, (0.5,) * 3, dims))
    plain = evaluate_points(model, variables, grid, pts, tile_points=256)
    sharded = evaluate_points(model, variables, grid, pts, tile_points=256, mesh=mesh)
    np.testing.assert_allclose(sharded, plain, rtol=1e-4, atol=1e-5)


def test_implicit_to_mesh_produces_obj(small_model, tmp_path):
    model, variables, grid, dims = small_model
    out = tmp_path / "m.obj"
    verts, tris = implicit_to_mesh(model, variables, grid, dims, 0.5, out)
    assert out.exists()
    # untrained net may or may not cross the threshold; geometry must be valid
    if len(verts):
        assert tris.min() >= 0 and tris.max() < len(verts)


def test_res_increase_scales_output(small_model):
    model, variables, grid, dims = small_model
    out = evaluate_on_grid(model, variables, grid, dims, res_increase=2, slab_rows=4)
    assert out.shape == tuple(2 * d for d in dims)
