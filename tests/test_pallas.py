"""Pallas kernel tests (interpreter mode on the CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sv3d_tpu.ops.pallas.mlp import fused_point_mlp


def _xla_mlp(f, ws, bs):
    h = f.astype(jnp.bfloat16)
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = jnp.dot(w.astype(jnp.bfloat16), h, preferred_element_type=jnp.float32)
        h = h + b[:, None]
        if i < len(ws) - 1:
            h = jnp.maximum(h, 0.0).astype(jnp.bfloat16)
    return h[0]


@pytest.mark.parametrize("F,N", [(2583, 2048), (2247, 1024)])
def test_fused_point_mlp_matches_xla(F, N, rng):
    h0, h1, h2 = 256, 256, 256
    ws = [
        jnp.asarray(rng.standard_normal((h0, F)).astype(np.float32) * 0.02),
        jnp.asarray(rng.standard_normal((h1, h0)).astype(np.float32) * 0.05),
        jnp.asarray(rng.standard_normal((h2, h1)).astype(np.float32) * 0.05),
        jnp.asarray(rng.standard_normal((1, h2)).astype(np.float32) * 0.05),
    ]
    bs = [
        jnp.asarray(rng.standard_normal((d,)).astype(np.float32) * 0.1)
        for d in (h0, h1, h2, 1)
    ]
    f = jnp.asarray(rng.standard_normal((F, N)).astype(np.float32))

    out = fused_point_mlp(
        f, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
        tile=1024, interpret=True,
    )
    ref = _xla_mlp(f, ws, bs)
    assert out.shape == (N,)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2)


def test_query_lattice_pallas_matches_xla(rng):
    """query_lattice with the fused Pallas MLP must match the XLA path."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(32))
    key = jax.random.PRNGKey(0)
    dims = (9, 8, 7)
    grid = jax.random.normal(key, (1, *dims, 1))
    variables = model.init(key, grid, jnp.zeros((1, 8, 3)), train=False)
    levels = model.apply(variables, grid, train=False, method=IFNet.encode)

    kw = dict(method=IFNet.query_lattice)
    a = model.apply(variables, levels, dims, 1, 3, 0, use_pallas_mlp=False, **kw)
    b = model.apply(variables, levels, dims, 1, 3, 0, use_pallas_mlp=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=2e-2)
