"""Pallas TPU kernel: fused per-point occupancy MLP.

Fuses the entire IF-Net decoder — fc0 (K=2583/2247) + two hidden layers +
the logit head, with biases and ReLUs — into one kernel that tiles the point
dimension.  The XLA version materializes every (256, N) hidden tensor in HBM
between layers; here the hiddens live in VMEM/registers, so HBM traffic is
exactly one read of the feature tile and one write of the logit tile.

Weights are passed in the displacement-major layout of IFNet.fc0_kernel.
Matmuls run on the MXU with bf16 operands and float32 accumulation
(preferred_element_type), matching the precision of the XLA path.

Used by the dense-lattice sweep (inference; no VJP needed).  Falls back to
interpreter mode off-TPU so tests run on the CPU backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mlp_kernel(f_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, out_ref):
    x = f_ref[:, :]  # (F, T) bf16
    h = jnp.dot(w0_ref[:, :], x, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b0_ref[:, :], 0.0).astype(x.dtype)
    h = jnp.dot(w1_ref[:, :], h, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:, :], 0.0).astype(x.dtype)
    h = jnp.dot(w2_ref[:, :], h, preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[:, :], 0.0).astype(x.dtype)
    out = jnp.dot(w3_ref[:, :], h, preferred_element_type=jnp.float32)
    out_ref[:, :] = out + b3_ref[:, :]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def fused_point_mlp(
    f: jnp.ndarray,
    w0: jnp.ndarray, b0: jnp.ndarray,
    w1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, b2: jnp.ndarray,
    w3: jnp.ndarray, b3: jnp.ndarray,
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """f: (F, N) features (N must be a multiple of `tile`); w_i: (H_out, H_in)
    with w3 (1, H); b_i: (H_out,).  Returns (N,) float32 logits."""
    F, N = f.shape
    assert N % tile == 0, f"N={N} must be a multiple of tile={tile}"
    h0, h1, h2 = w0.shape[0], w1.shape[0], w2.shape[0]
    dt = jnp.bfloat16

    cols = lambda b: b.astype(jnp.float32).reshape(-1, 1)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(N // tile,),
        in_specs=[
            pl.BlockSpec((F, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h0, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h0, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, h0), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, h1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, N), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * (F * h0 + h0 * h1 + h1 * h2 + h2),
            bytes_accessed=F * N * 2 + N * 4 + 2 * (F * h0 + h0 * h1 + h1 * h2 + h2),
            transcendentals=0,
        ),
    )(
        f.astype(dt),
        w0.astype(dt), cols(b0),
        w1.astype(dt), cols(b1),
        w2.astype(dt), cols(b2),
        w3.astype(dt), cols(b3),
    )
    return out[0]


def default_interpret() -> bool:
    """Interpreter mode unless running on a real TPU backend."""
    return jax.default_backend() != "tpu"
