"""Backward kernels for the fused point-query path (point_query.py), making
the MXU interpolation differentiable — the training-step analog of the
reference's grid_sample backward (torch autograd; our XLA gather path's
backward measures ~680 ms at B=8 x 4096 points, dominated by per-index
scatters into the pyramid volumes).

Both kernels reuse the forward's bucketed layout and hat-weight algebra:

* grad wrt POINTS (level_grad_points): per displacement copy, two extra
  pencil matmuls with the hat DERIVATIVE matrices (dW0 = dhat0*hat1,
  dW1 = hat0*dhat1) against the slab table, then lane row-dots with the
  incoming gradient g — d feat / d ix contracted on the VPU.

* grad wrt the VOLUME (level_grad_vol): the exact transpose of the forward
  pencil matmul, W^T @ (h2 * g), accumulated per slab window.  Window rows
  overlap across slabs and displacement groups, so accumulation is
  read-modify-write over an aliased HBM buffer: THREE chained pallas_calls
  (axis-0 displacement groups -d / center / +d), each flushing its VMEM
  window accumulator on slab change — the sequential TPU grid makes RMW
  race-free.

Matmuls run bf16 with f32 accumulation, matching the forward's precision
class (~1e-2 relative); training with the fused path is therefore a
mixed-precision mode, opt-in via IFNetConfig.fused_query.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sv3d_tpu.ops.pallas.point_query import (
    DISPLACEMENTS,
    TILE,
    _ix_affine,
    _level_windows,
)


def _hat(ix, rows):
    return jnp.maximum(0.0, 1.0 - jnp.abs(ix - rows))


def _dhat(ix, rows):
    """d/d ix of the hat: -sign(ix - r) inside the support, 0 outside
    (matches the XLA path's +-1 fractional-weight derivatives)."""
    d = ix - rows
    return jnp.where(jnp.abs(d) < 1.0, -jnp.sign(d), 0.0)


def _geometry(dims, align_corners, displacement):
    g0, g1, g2 = (int(d) for d in dims)
    a0, b0 = _ix_affine(g0, align_corners)
    a1, b1 = _ix_affine(g1, align_corners)
    a2, b2 = _ix_affine(g2, align_corners)
    dsh = (displacement * a0, displacement * a1, displacement * a2)
    return (a0, b0), (a1, b1), (a2, b2), dsh


# ---------------------------------------------------------------------------
# grad wrt points
# ---------------------------------------------------------------------------

def _make_points_kernel(dims, c, g2p, g1p, rows, wrows, align_corners,
                        displacement, tile):
    g0, g1, g2 = (int(d) for d in dims)
    (a0, b0), (a1, b1), (a2, b2), dsh = _geometry(dims, align_corners,
                                                  displacement)
    bf = jnp.bfloat16

    def kernel(base_ref, woff_ref, used_ref, vol_ref, q0_ref, q1_ref, q2_ref,
               g_ref, foldt_ref, out_ref, tab_ref, state_ref, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        base = base_ref[bi, ti]
        skip = used_ref[bi, ti] == 0

        @pl.when(skip)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(jnp.logical_and(ti == 0, bi == 0))
        def _():
            state_ref[0] = -1
            state_ref[1] = -1

        @pl.when(
            jnp.logical_and(
                jnp.logical_not(skip),
                jnp.logical_or(state_ref[0] != base, state_ref[1] != bi),
            )
        )
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[bi, pl.ds(base, rows)], tab_ref, sem
            )
            dma.start()
            dma.wait()
            state_ref[0] = base
            state_ref[1] = bi

        p0 = q0_ref[0]
        p1 = q1_ref[0]
        p2 = q2_ref[0]
        ix0 = a0 * p0 + b0
        ix1 = a1 * p1 + b1
        ix2 = a2 * p2 + b2

        ab = jax.lax.broadcasted_iota(jnp.int32, (tile, wrows * g1p), 1)
        arow = (ab // g1p).astype(jnp.float32)
        bcol = (ab % g1p).astype(jnp.float32)
        kidx = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, g2p), 1) // c
        ).astype(jnp.float32)
        kvalid = kidx < float(g2)

        @pl.when(jnp.logical_not(skip))
        def _compute():
            gix0 = jnp.zeros((tile, 1), jnp.float32)
            gix1 = jnp.zeros((tile, 1), jnp.float32)
            gix2 = jnp.zeros((tile, 1), jnp.float32)
            for d, (s0, s1, s2) in enumerate(DISPLACEMENTS):
                woff = woff_ref[bi, s0 + 1, ti]
                dix0 = ix0 + s0 * dsh[0]
                dix1 = ix1 + s1 * dsh[1]
                dix2 = ix2 + s2 * dsh[2]
                rows_abs = (base + woff).astype(jnp.float32) + arow
                h0 = _hat(dix0, rows_abs)
                h1 = _hat(dix1, bcol)
                tab = tab_ref[pl.ds(woff, wrows)].reshape(wrows * g1p, g2p)

                def pencil(w):
                    return jax.lax.dot_general(
                        w.astype(bf), tab, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )

                # gd: this copy's incoming grad spread to the (k, c) lanes via
                # the constant 0/1 fold matrix (a broadcast reshape is an
                # unsupported Mosaic shape cast)
                gd = jax.lax.dot_general(
                    g_ref[0, :, d * c : (d + 1) * c].astype(bf), foldt_ref[:, :],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                h2 = jnp.where(kvalid, _hat(dix2, kidx), 0.0)
                common = gd * h2
                gix0 += jnp.sum(pencil(_dhat(dix0, rows_abs) * h1) * common,
                                axis=1, keepdims=True)
                gix1 += jnp.sum(pencil(h0 * _dhat(dix1, bcol)) * common,
                                axis=1, keepdims=True)
                dh2 = jnp.where(kvalid, _dhat(dix2, kidx), 0.0)
                gix2 += jnp.sum(pencil(h0 * h1) * gd * dh2,
                                axis=1, keepdims=True)

            out_ref[0, :, 0:1] = gix0 * a0
            out_ref[0, :, 1:2] = gix1 * a1
            out_ref[0, :, 2:3] = gix2 * a2

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "g0_fine", "align_corners", "displacement",
                     "tile", "interpret"),
)
def level_grad_points(
    vol, q0, q1, q2, tile_slab, tile_used, g,
    dims: tuple, g0_fine: int, align_corners: bool, displacement: float,
    tile: int = TILE, interpret: bool = False,
):
    """d(features)/d(padded coords): vol (B, g0, g1, g2, C), g (B, P, 7C)
    incoming feature grads -> (B, P, 3) grads wrt the [-1, 1] coords."""
    b, g0, g1, g2, c = vol.shape
    p = q0.shape[1]
    nt = p // tile
    g2c = g2 * c
    g2p = -(-g2c // 128) * 128
    g1p = -(-g1 // 8) * 8
    assert g2p % c == 0, (g2p, c)  # kernel spreads gd by g2p//c blocks

    tab_lo, woff_np, rows, wrows = _level_windows(
        g0_fine, dims, align_corners, displacement
    )
    tile_base = jnp.asarray(tab_lo)[tile_slab]
    tile_woff = jnp.moveaxis(jnp.asarray(woff_np)[tile_slab], -1, 1)

    volp = vol.astype(jnp.bfloat16).reshape(b, g0, g1, g2c)
    pad_kc = g2p - g2c
    if pad_kc or g1p != g1:
        volp = jnp.pad(volp, ((0, 0), (0, 0), (0, g1p - g1), (0, pad_kc)))

    # foldT[c', k*C + c] = 1[c == c']
    foldt = jnp.asarray(
        np.tile(np.eye(c, dtype=np.float32), (1, g2p // c))
        if g2p % c == 0
        else np.pad(np.tile(np.eye(c, dtype=np.float32), (1, (g2p // c))),
                    ((0, 0), (0, g2p - (g2p // c) * c))),
        jnp.bfloat16,
    )
    kernel = _make_points_kernel(
        dims, c, g2p, g1p, rows, wrows, align_corners, displacement, tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tile_base, tile_woff, tile_used
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 7 * c), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # foldT
        ],
        out_specs=pl.BlockSpec((1, tile, 3), lambda bi, ti, *_: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, g1p, g2p), jnp.bfloat16),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 3), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        tile_base, tile_woff, tile_used, volp,
        q0[..., None], q1[..., None], q2[..., None], g, foldt,
    )


# ---------------------------------------------------------------------------
# grad wrt the volume
# ---------------------------------------------------------------------------

# displacement-copy indices per axis-0 group (s0 = -1 / 0 / +1)
_D_GROUPS = (
    tuple(i for i, d in enumerate(DISPLACEMENTS) if d[0] == -1),
    tuple(i for i, d in enumerate(DISPLACEMENTS) if d[0] == 0),
    tuple(i for i, d in enumerate(DISPLACEMENTS) if d[0] == 1),
)


def _make_vol_kernel(dims, c, g2p, g1p, wrows, align_corners, displacement,
                     tile, group: int):
    g0, g1, g2 = (int(d) for d in dims)
    (a0, b0), (a1, b1), (a2, b2), dsh = _geometry(dims, align_corners,
                                                  displacement)
    bf = jnp.bfloat16
    s0_group = group - 1

    def kernel(wlo_ref, used_ref, q0_ref, q1_ref, q2_ref, g_ref, foldt_ref,
               acc_in_ref, out_ref, acc_ref, state_ref, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        nt = pl.num_programs(1)
        wlo = wlo_ref[bi, ti]
        skip = used_ref[bi, ti] == 0

        @pl.when(jnp.logical_and(ti == 0, bi == 0))
        def _():
            state_ref[0] = -1
            state_ref[1] = -1

        # flush + reload the window accumulator when the window moves
        # (pure-padding tiles contribute nothing and skip the machinery)
        @pl.when(
            jnp.logical_and(
                jnp.logical_not(skip),
                jnp.logical_or(state_ref[0] != wlo, state_ref[1] != bi),
            )
        )
        def _():
            @pl.when(state_ref[0] >= 0)
            def _():
                dma = pltpu.make_async_copy(
                    acc_ref,
                    out_ref.at[state_ref[1], pl.ds(state_ref[0], wrows)],
                    sem,
                )
                dma.start()
                dma.wait()
            dma = pltpu.make_async_copy(
                out_ref.at[bi, pl.ds(wlo, wrows)], acc_ref, sem
            )
            dma.start()
            dma.wait()
            state_ref[0] = wlo
            state_ref[1] = bi

        p0 = q0_ref[0]
        p1 = q1_ref[0]
        p2 = q2_ref[0]
        ix0 = a0 * p0 + b0 + s0_group * dsh[0]
        ix1 = a1 * p1 + b1
        ix2 = a2 * p2 + b2

        ab = jax.lax.broadcasted_iota(jnp.int32, (tile, wrows * g1p), 1)
        arow = (ab // g1p).astype(jnp.float32) + wlo.astype(jnp.float32)
        bcol = (ab % g1p).astype(jnp.float32)
        kidx = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, g2p), 1) // c
        ).astype(jnp.float32)
        kvalid = kidx < float(g2)

        h0 = _hat(ix0, arow)
        contrib = jnp.zeros((wrows * g1p, g2p), jnp.float32)
        for d in _D_GROUPS[group]:  # noqa: B007
            _, s1, s2 = DISPLACEMENTS[d]
            dix1 = ix1 + s1 * dsh[1]
            dix2 = ix2 + s2 * dsh[2]
            w = h0 * _hat(dix1, bcol)  # (T, wrows*g1p)
            gd = jax.lax.dot_general(
                g_ref[0, :, d * c : (d + 1) * c].astype(bf), foldt_ref[:, :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )
            h2 = jnp.where(kvalid, _hat(dix2, kidx), 0.0)
            contrib += jax.lax.dot_general(
                w.astype(bf), (gd * h2).astype(bf),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        @pl.when(jnp.logical_not(skip))
        def _():
            acc_ref[...] = acc_ref[...] + contrib.reshape(wrows, g1p, g2p)

        # final flush: write the LOADED window (state refs — the last grid
        # tile may be pure padding with a different nominal window)
        @pl.when(
            jnp.logical_and(
                jnp.logical_and(bi == pl.num_programs(0) - 1, ti == nt - 1),
                state_ref[0] >= 0,
            )
        )
        def _():
            dma = pltpu.make_async_copy(
                acc_ref, out_ref.at[state_ref[1], pl.ds(state_ref[0], wrows)],
                sem,
            )
            dma.start()
            dma.wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("dims", "g0_fine", "align_corners", "displacement",
                     "tile", "interpret"),
)
def level_grad_vol(
    q0, q1, q2, tile_slab, tile_used, g,
    dims: tuple, g0_fine: int, align_corners: bool, displacement: float,
    tile: int = TILE, interpret: bool = False,
):
    """d(features)/d(volume): g (B, P, 7C) -> (B, g0, g1, g2, C) float32."""
    b, p, sevenc = g.shape
    c = sevenc // 7
    g0, g1, g2 = (int(d) for d in dims)
    nt = p // tile
    g2c = g2 * c
    g2p = -(-g2c // 128) * 128
    g1p = -(-g1 // 8) * 8

    tab_lo, woff_np, rows, wrows = _level_windows(
        g0_fine, dims, align_corners, displacement
    )

    grad = jnp.zeros((b, g0, g1p, g2p), jnp.float32)
    for group in range(3):
        # absolute window start per tile for this displacement group
        wlo_np = np.clip(
            tab_lo + woff_np[:, group], 0, max(g0 - wrows, 0)
        ).astype(np.int32)
        tile_wlo = jnp.asarray(wlo_np)[tile_slab]  # (B, NT)

        foldt = jnp.asarray(
            np.tile(np.eye(c, dtype=np.float32), (1, g2p // c)), jnp.bfloat16
        )
        kernel = _make_vol_kernel(
            dims, c, g2p, g1p, wrows, align_corners, displacement, tile,
            group,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tile_wlo, tile_used
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, 7 * c), lambda bi, ti, *_: (bi, ti, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # foldT
                pl.BlockSpec(memory_space=pl.ANY),  # aliased accumulator
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((wrows, g1p, g2p), jnp.float32),
                pltpu.SMEM((2,), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        grad = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, g0, g1p, g2p), jnp.float32),
            input_output_aliases={7: 0},  # accumulate across the 3 groups
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(
            tile_wlo, tile_used, q0[..., None], q1[..., None], q2[..., None],
            g, foldt, grad,
        )
    return grad[:, :, :g1, :g2c].reshape(b, g0, g1, g2, c)


# ---------------------------------------------------------------------------
# differentiable fused level features (custom VJP)
# ---------------------------------------------------------------------------

from sv3d_tpu.ops.pallas.point_query import level_features  # noqa: E402


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def level_features_diff(vol, q0, q1, q2, tile_slab, tile_used, dims, g0_fine,
                        align_corners, displacement, tile, interpret):
    """level_features with a custom VJP (grad_vol + grad_points kernels) —
    lets training differentiate through the fused interpolation."""
    return level_features(
        vol, q0, q1, q2, tile_slab, tile_used, dims, g0_fine, align_corners,
        displacement, tile=tile, interpret=interpret,
    )


def _lf_fwd(vol, q0, q1, q2, tile_slab, tile_used, dims, g0_fine,
            align_corners, displacement, tile, interpret):
    out = level_features(
        vol, q0, q1, q2, tile_slab, tile_used, dims, g0_fine, align_corners,
        displacement, tile=tile, interpret=interpret,
    )
    return out, (vol, q0, q1, q2, tile_slab, tile_used)


def _lf_bwd(dims, g0_fine, align_corners, displacement, tile, interpret,
            res, g):
    vol, q0, q1, q2, tile_slab, tile_used = res
    gv = level_grad_vol(
        q0, q1, q2, tile_slab, tile_used, g, dims, g0_fine, align_corners,
        displacement, tile=tile, interpret=interpret,
    )
    gp = level_grad_points(
        vol, q0, q1, q2, tile_slab, tile_used, g, dims, g0_fine,
        align_corners, displacement, tile=tile, interpret=interpret,
    )
    g_slab = np.zeros(tile_slab.shape, jax.dtypes.float0)
    g_used = np.zeros(tile_used.shape, jax.dtypes.float0)
    return gv, gp[..., 0], gp[..., 1], gp[..., 2], g_slab, g_used


level_features_diff.defvjp(_lf_fwd, _lf_bwd)
