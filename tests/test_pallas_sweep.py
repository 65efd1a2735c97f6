"""Fused sweep-tail kernel (sv3d_tpu/ops/pallas/sweep.py) parity tests.

The fused path deletes the dense sweep's f-tensor materialization: per slab
it hands the axis-0/1 resized partials to one Pallas kernel that finishes
the axis-2 resize + fc0 + MLP tail in VMEM, with a static per-level
contraction-order choice (resize-then-fc0 for shallow levels, fc0-then-
resize for deep ones).  These tests run the kernel in interpreter mode on
the CPU backend at float32 and require near-exact agreement with the
unfused matmul lattice path (which test_lattice ties to the gather ground
truth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.config import IFNetConfig
from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.ops.pallas.sweep import sweep_level_is_shallow


def test_order_heuristic_full_scale():
    # at full scale (r2 = 224, H = 256) the shallow/deep split lands between
    # the wide low-channel levels and the coarse high-channel ones
    r2, h = 224, 256
    assert sweep_level_is_shallow(8, 112, r2, h)
    assert sweep_level_is_shallow(16, 112, r2, h)
    assert not sweep_level_is_shallow(64, 28, r2, h)
    assert not sweep_level_is_shallow(128, 14, r2, h)
    assert not sweep_level_is_shallow(128, 7, r2, h)


@pytest.mark.parametrize(
    "net_res,dims",
    [(128, (17, 16, 18)), (32, (12, 9, 10))],
)
def test_fused_sweep_matches_lattice(net_res, dims):
    """Interpret-mode fused tail == unfused matmul path (f32), including a
    slab at the padded axis-0 edge.  Both shallow and deep per-level orders
    are exercised (the heuristic picks a mix at these shapes)."""
    cfg = IFNetConfig.for_net_res(net_res)
    model = IFNet(cfg)
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (1, *dims, 1))
    variables = model.init(key, grid, jnp.zeros((1, 8, 3)), train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)

    slab = 2
    r0 = dims[0] * 2
    kw = dict(
        method=IFNet.query_lattice, compute_dtype=jnp.float32,
        use_pallas_mlp=False,
    )
    for off in (0, r0 - slab):  # interior + padded edge slab
        ref = model.apply(
            variables, levels, dims, 2, slab, jnp.asarray(off, jnp.int32),
            fused_tail=False, **kw,
        )
        fused = model.apply(
            variables, levels, dims, 2, slab, jnp.asarray(off, jnp.int32),
            fused_tail=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"net{net_res} offset {off}",
        )


def test_fused_sweep_bf16_smoke():
    """bf16 compute (the production dtype) stays within mixed-precision
    tolerance of the f32 path on sigmoid outputs."""
    cfg = IFNetConfig.for_net_res(32)
    model = IFNet(cfg)
    key = jax.random.PRNGKey(1)
    dims = (12, 9, 10)
    grid = jax.random.normal(key, (1, *dims, 1))
    variables = model.init(key, grid, jnp.zeros((1, 8, 3)), train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)

    kw = dict(method=IFNet.query_lattice, use_pallas_mlp=False)
    ref = model.apply(
        variables, levels, dims, 2, 2, jnp.asarray(0, jnp.int32),
        compute_dtype=jnp.float32, fused_tail=False, **kw,
    )
    fused = model.apply(
        variables, levels, dims, 2, 2, jnp.asarray(0, jnp.int32),
        compute_dtype=jnp.bfloat16, fused_tail=True, **kw,
    )
    sig = lambda x: 1.0 / (1.0 + np.exp(-np.asarray(x, np.float32)))
    np.testing.assert_allclose(sig(fused), sig(ref), atol=2e-2)
