"""Pallas TPU kernel: fused multi-level trilinear feature interpolation for
ARBITRARY query points (the gather path of IF-Net, reference
model/ifnet.py:82-120,155-199, rebuilt MXU-first).

Why not gathers?  XLA's per-index gather on TPU runs ~0.2 M pts/s through the
IF-Net pyramid (measured, scripts/measure_step.py), and Mosaic's in-kernel
`dynamic_gather` only spans one vreg along the gathered axis (8 sublanes / 128
lanes) — useless for multi-MB feature volumes.  This kernel instead turns the
interpolation into dense MXU contractions:

  1. Queries are COUNTING-BUCKETED by axis-0 slab (4 fine rows per slab) into
     a tile-padded layout — no sort, no dynamic shapes, overflow-free (the
     padded capacity N + n_slabs*TILE is a static worst case).
  2. Per (batch, tile) grid step, the kernel DMAs the slab's row window of the
     level volume into VMEM (skipped when the previous tile used the same
     window) as a (ROWS, g1, g2*C) table.
  3. For each of the 7 displacement copies (reference model/ifnet.py:82-91)
     it builds the per-query axis-0/axis-1 hat-weight matrix
     W[q, (a, b)] = hat(ix0 - row_a) * hat(ix1 - b)   (VPU, banded one-hot)
     and contracts  pencil = W @ table  on the MXU — selecting each query's
     (2 x 2) row-plane pencil and interpolating axes 0/1 in one matmul.
  4. The axis-2 interpolation multiplies the pencil by the per-query k-hat
     mask and folds k with a CONSTANT (g2*C, C) 0/1 matrix — a second matmul.

Out-of-range queries (and the padding slots, parked at sentinel coordinate
p=+2) fall out with zero weights — exactly the reference's
grid_sample(padding_mode='zeros') semantics.  Both align_corners conventions
are supported (reference uses True for the 32-res variant, False for 128-res).

Compute runs in bfloat16 with float32 accumulation (MXU-native); max feature
error vs the float32 XLA path is ~1e-2 relative.  This path is therefore used
for INFERENCE (evaluate_points); training keeps the float32 XLA gather path
and its exact autodiff.

Measured on v5e (B=8, 4096 pts, IF-Net-128): see BENCH notes / tests.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128          # queries per grid step (MXU sublane-friendly)
SLAB_FINE_ROWS = 4  # axis-0 rows of the FINEST level per bucket

# displacement copy order of sv3d_tpu.ops.grid_sample.displacement_axes:
# (center, -d0, +d0, -d1, +d1, -d2, +d2); entries are per-axis sign factors
DISPLACEMENTS = (
    (0, 0, 0), (-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1), (0, 0, 1)
)


def _ix_affine(g: int, align_corners: bool):
    """ix = A * p + B mapping [-1, 1] coords to continuous row index (torch
    grid_sample conventions; see sv3d_tpu/ops/grid_sample.py:_axis_indices)."""
    a = 0.5 * (g - 1) if align_corners else 0.5 * g
    return a, 0.5 * (g - 1)


def _num_slabs(g0_fine: int) -> int:
    return max(1, -(-g0_fine // SLAB_FINE_ROWS))


@functools.partial(jax.jit, static_argnames=("g0_fine", "align_corners", "tile"))
def bucket_queries(p0, p1, p2, g0_fine: int, align_corners: bool, tile: int = TILE):
    """Counting-bucket (B, N) queries by fine axis-0 slab into a tile-padded
    layout.  Returns (q0, q1, q2) (B, P) padded coords (sentinel +2.0 in pad
    slots), pos (B, N) padded position of each original query, tile_slab
    (B, NT) slab id per tile, tile_used (B, NT) real-query count per tile.
    P = n_slabs*tile + N rounded up is static."""
    b, n = p0.shape
    ns = _num_slabs(g0_fine)
    cap = -(-(n + ns * tile) // tile) * tile
    a0, b0 = _ix_affine(g0_fine, align_corners)
    ix0 = a0 * p0 + b0
    slab = jnp.clip(
        jnp.floor(ix0 / SLAB_FINE_ROWS).astype(jnp.int32), 0, ns - 1
    )  # (B, N); out-of-range queries park in edge slabs, weights vanish

    onehot = (slab[..., None] == jnp.arange(ns, dtype=jnp.int32)).astype(jnp.int32)
    csum = jnp.cumsum(onehot, axis=1)  # inclusive
    rank = jnp.take_along_axis(csum, slab[..., None], axis=2)[..., 0] - 1  # (B, N)
    counts = csum[:, -1, :]  # (B, ns)
    # every slab gets at least one tile so consumers that write per-slab
    # output blocks (ops/pallas/voxelize.py) always initialize every block
    padded = jnp.maximum(-(-counts // tile), 1) * tile
    starts = jnp.cumsum(padded, axis=1) - padded  # exclusive cumsum (B, ns)
    pos = jnp.take_along_axis(starts, slab, axis=1) + rank  # (B, N)

    def scatter(p):
        out = jnp.full((b, cap), 2.0, p.dtype)
        return jax.vmap(lambda o, ps, v: o.at[ps].set(v))(out, pos, p)

    nt = cap // tile
    # slab owning each tile: the last slab whose padded start <= tile start
    tile_start = jnp.arange(nt, dtype=jnp.int32) * tile
    tile_slab = jax.vmap(
        lambda st: jnp.searchsorted(st, tile_start, side="right").astype(jnp.int32)
        - 1
    )(starts)
    tile_slab = jnp.clip(tile_slab, 0, ns - 1)
    # real queries in each tile (0 for pure-padding tiles — kernels skip them)
    slab_start = jnp.take_along_axis(starts, tile_slab, axis=1)
    slab_count = jnp.take_along_axis(counts, tile_slab, axis=1)
    tile_used = jnp.clip(
        slab_count - (tile_start[None, :] - slab_start), 0, tile
    ).astype(jnp.int32)
    return scatter(p0), scatter(p1), scatter(p2), pos, tile_slab, tile_used


@functools.partial(
    jax.jit,
    static_argnames=("g0_fine", "g1_fine", "align_corners", "band_cols", "tile"),
)
def bucket_queries_2d(
    p0, p1, p2, g0_fine: int, g1_fine: int, align_corners: bool,
    band_cols: int, tile: int = TILE,
):
    """2-D counting bucketing: (axis-0 slab, axis-1 band of band_cols fine
    columns).  Same contract as bucket_queries but returns an extra tile_band
    (B, NT) array.  Shrinks the per-tile table window from (wrows, g1) to
    (wrows, wcols) so the banded kernel's contraction K drops ~3x on the
    full-res levels (see ARCHITECTURE.md §9's FLOP-amplification analysis).

    Rank-within-bucket comes from a stable argsort of bucket ids (the
    (B, N, n_buckets) one-hot cumsum of the 1-D version would materialize
    ~250 MB at 262k points x 245 buckets)."""
    b, n = p0.shape
    ns0 = _num_slabs(g0_fine)
    nb1 = max(1, -(-g1_fine // band_cols))
    nb = ns0 * nb1
    cap = -(-(n + nb * tile) // tile) * tile
    nt = cap // tile
    a0, b0 = _ix_affine(g0_fine, align_corners)
    a1, b1 = _ix_affine(g1_fine, align_corners)
    slab = jnp.clip(
        jnp.floor((a0 * p0 + b0) / SLAB_FINE_ROWS).astype(jnp.int32), 0, ns0 - 1
    )
    band = jnp.clip(
        jnp.floor((a1 * p1 + b1) / band_cols).astype(jnp.int32), 0, nb1 - 1
    )
    bucket = slab * nb1 + band  # (B, N)

    tile_start = jnp.arange(nt, dtype=jnp.int32) * tile

    def one(bkt):
        order = jnp.argsort(bkt)  # stable on equal keys
        sb = bkt[order]
        starts_sorted = jnp.searchsorted(
            sb, jnp.arange(nb, dtype=sb.dtype)
        ).astype(jnp.int32)
        rank_sorted = jnp.arange(n, dtype=jnp.int32) - starts_sorted[sb]
        rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)
        counts = jnp.diff(jnp.append(starts_sorted, np.int32(n)))
        padded = jnp.maximum(-(-counts // tile), 1) * tile
        starts = jnp.cumsum(padded) - padded
        pos = starts[bkt] + rank
        tb = jnp.clip(
            jnp.searchsorted(starts, tile_start, side="right").astype(jnp.int32)
            - 1,
            0,
            nb - 1,
        )
        used = jnp.clip(
            counts[tb] - (tile_start - starts[tb]), 0, tile
        ).astype(jnp.int32)
        return pos, tb, used

    pos, tb, tile_used = jax.vmap(one)(bucket)

    def scatter(p):
        out = jnp.full((b, cap), 2.0, p.dtype)
        return jax.vmap(lambda o, ps, v: o.at[ps].set(v))(out, pos, p)

    return (
        scatter(p0), scatter(p1), scatter(p2), pos,
        tb // nb1, tb % nb1, tile_used,
    )


def _level_windows(g0_fine: int, dims, align_corners: bool, displacement: float):
    """Static numpy per-slab table windows for one level.

    Returns (tab_lo (ns,), woff (ns, 3), ROWS, WROWS, dshifts (3 floats)).
    tab_lo[s]: first volume row DMA'd for slab s; woff[s, j]: window offset
    within the table for axis-0 displacement j-1 in {-1, 0, +1}."""
    g0l = int(dims[0])
    ns = _num_slabs(g0_fine)
    af, bf = _ix_affine(g0_fine, align_corners)
    al, bl = _ix_affine(g0l, align_corners)
    scale = al / af
    # level-space ix of a slab's fine-row span [s*R, (s+1)*R)
    lo = scale * (np.arange(ns) * SLAB_FINE_ROWS - bf) + bl
    width = scale * SLAB_FINE_ROWS
    dsh = displacement * al  # axis-0 shift of the +/-d copies, in level rows
    wrows = min(g0l, int(math.ceil(width)) + 3)
    rows = min(g0l, int(math.ceil(width + 2 * dsh)) + 5)
    tab_lo = np.clip(np.floor(lo - dsh) - 1, 0, max(g0l - rows, 0)).astype(np.int32)
    woff = np.stack(
        [
            np.clip(np.floor(lo + j * dsh) - 1 - tab_lo, 0, rows - wrows)
            for j in (-1, 0, 1)
        ],
        axis=1,
    ).astype(np.int32)
    return tab_lo, woff, rows, wrows


def _band_windows(
    g1_fine: int, dims, align_corners: bool, displacement: float,
    band_cols: int,
):
    """Static per-band axis-1 column windows for one level.

    Returns (col_lo (nb1,) int32, WCOLS).  col_lo is 8-ALIGNED (DMA slices of
    HBM arrays must be 8-aligned on the sublane-tiled second-to-last dim) and
    WCOLS is an 8-multiple covering the band span plus the ±displacement
    shift plus hat support — unlike the axis-0 woff machinery there is no
    per-displacement column sub-window; the hat weights select within the
    window (zeros elsewhere), trading a slightly larger K for no unaligned
    scratch slicing."""
    g1l = int(dims[1])
    g1p = -(-g1l // 8) * 8
    nb1 = max(1, -(-g1_fine // band_cols))
    af, bf = _ix_affine(g1_fine, align_corners)
    al, bl = _ix_affine(g1l, align_corners)
    scale = al / af
    lo = scale * (np.arange(nb1) * band_cols - bf) + bl
    width = scale * band_cols
    dsh = displacement * al
    lo_need = np.floor(lo - dsh) - 1.0
    hi_need = np.ceil(lo + width + dsh) + 2.0
    col_lo = np.maximum((lo_need.astype(np.int64) // 8) * 8, 0)
    wcols = int(min(g1p, -(-int((hi_need - col_lo).max()) // 8) * 8))
    col_lo = np.clip(col_lo, 0, max(g1p - wcols, 0)).astype(np.int32)
    # the kernel reconstructs the window start as <prefetched col_lo // 8>*8
    # (_level_features_banded_impl), so a non-8-aligned start would silently
    # shift the DMA window and corrupt features — fail loudly instead
    assert (col_lo % 8 == 0).all(), (dims, band_cols, col_lo)
    # static coverage check: every band's window spans its in-volume support
    assert wcols == g1p or (
        (col_lo <= np.maximum(lo_need, 0)).all()
        and (col_lo + wcols >= np.minimum(hi_need, g1p)).all()
    ), (dims, band_cols, col_lo, wcols)
    return col_lo, wcols


def _band_windows_disp(
    g1_fine: int, dims, align_corners: bool, displacement: float,
    band_cols: int,
):
    """Per-displacement axis-1 column SUB-windows inside the union DMA window
    (the K-fill experiment of ARCHITECTURE.md §9): `_band_windows`' single
    window must cover the band span plus BOTH displacement directions plus
    hat support plus 8-alignment slack (wcols=32 at full res for
    band_cols=16, K=wrows*32=224, 0.88 K-tile fill).  Each axis-1
    displacement sign only needs span+hat+slack, so giving displacement j in
    {-1, 0, +1} its own 8-aligned sub-window shrinks the contraction K to
    wrows*WCOLS_K (e.g. wrows*16=112 at band_cols<=6, one exactly-fillable
    128-deep MXU K-pass — the "wcols≈18" geometry the alignment rules round
    away, recovered by shifting INSIDE the already-DMA'd window).

    Returns (coff8 (nb1, 3) int32, WCOLS_K): per-band, per-displacement-sign
    sub-window offsets DIVIDED BY 8 (within the union window — the kernel
    reconstructs offset*8 so Mosaic can prove sublane-dim divisibility), and
    the uniform sub-window width (8-multiple).  Coverage is asserted like
    `_band_windows`."""
    g1l = int(dims[1])
    g1p = -(-g1l // 8) * 8
    nb1 = max(1, -(-g1_fine // band_cols))
    af, bf = _ix_affine(g1_fine, align_corners)
    al, bl = _ix_affine(g1l, align_corners)
    scale = al / af
    lo = scale * (np.arange(nb1) * band_cols - bf) + bl
    width = scale * band_cols
    dsh = displacement * al
    col_lo, wcols = _band_windows(
        g1_fine, dims, align_corners, displacement, band_cols
    )
    col_lo64 = col_lo.astype(np.int64)
    subs, his = [], []
    for j in (-1, 0, 1):
        lo_need = np.floor(lo + j * dsh) - 1.0
        hi_need = np.ceil(lo + width + j * dsh) + 2.0
        s = np.maximum((lo_need.astype(np.int64) // 8) * 8, col_lo64)
        subs.append(s)
        his.append(hi_need)
    wcols_k = int(
        min(
            wcols,
            max(
                -(-int((hi - s).max()) // 8) * 8
                for s, hi in zip(subs, his)
            ),
        )
    )
    coff = []
    for j, (s, hi) in enumerate(zip(subs, his)):
        s = np.minimum(s, col_lo64 + wcols - wcols_k)
        lo_need = np.floor(lo + (j - 1) * dsh) - 1.0
        # sub-window must span the in-union-window support of this
        # displacement's hat weights — fail loudly, never corrupt
        assert wcols_k == wcols or (
            (s <= np.maximum(lo_need, col_lo64)).all()
            and (s + wcols_k >= np.minimum(hi, col_lo64 + wcols)).all()
        ), (dims, band_cols, j - 1, s, wcols_k)
        assert ((s - col_lo64) % 8 == 0).all() and (s >= col_lo64).all()
        coff.append(((s - col_lo64) // 8).astype(np.int32))
    return np.stack(coff, axis=1), wcols_k


def _hat(ix, rows):
    return jnp.maximum(0.0, 1.0 - jnp.abs(ix - rows))


def _make_kernel(dims, c: int, g2p: int, g1p: int, rows: int, wrows: int,
                 align_corners: bool, displacement: float, tile: int):
    """Kernel body for one pyramid level (all shape params static)."""
    g0, g1, g2 = (int(d) for d in dims)
    a0, b0 = _ix_affine(g0, align_corners)
    a1, b1 = _ix_affine(g1, align_corners)
    a2, b2 = _ix_affine(g2, align_corners)
    dsh = (displacement * a0, displacement * a1, displacement * a2)

    def kernel(base_ref, woff_ref, used_ref, vol_ref, q0_ref, q1_ref, q2_ref,
               fold_ref, out_ref, tab_ref, state_ref, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        base = base_ref[bi, ti]

        @pl.when(jnp.logical_and(ti == 0, bi == 0))
        def _():
            state_ref[0] = -1
            state_ref[1] = -1

        # pure-padding tile: skip DMA + all 7 contractions and zero the
        # output block (garbage would NaN-poison weight grads through the
        # 0 * NaN products of the MLP backward over padded slots)
        skip = used_ref[bi, ti] == 0

        @pl.when(skip)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        # DMA the slab's row window unless the previous tile already loaded it
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

        # query coords for this tile: (T, 1) column vectors
        p0 = q0_ref[0]  # (T, 1)
        p1 = q1_ref[0]
        p2 = q2_ref[0]
        ix0 = a0 * p0 + b0
        ix1 = a1 * p1 + b1
        ix2 = a2 * p2 + b2

        # lane iotas reused across displacement copies
        ab = jax.lax.broadcasted_iota(jnp.int32, (tile, wrows * g1p), 1)
        arow = (ab // g1p).astype(jnp.float32)
        bcol = (ab % g1p).astype(jnp.float32)
        kidx = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, g2p), 1) // c
        ).astype(jnp.float32)
        kvalid = kidx < float(g2)  # g2*C padded up to a lane multiple

        fold = fold_ref[:, :]  # (g2p, c) constant 0/1 bf16

        @pl.when(jnp.logical_not(skip))
        def _compute():
            for d, (s0, s1, s2) in enumerate(DISPLACEMENTS):
                woff = woff_ref[bi, s0 + 1, ti]
                dix0 = ix0 + s0 * dsh[0]
                dix1 = ix1 + s1 * dsh[1]
                dix2 = ix2 + s2 * dsh[2]
                # W[q, (a, b)]: the static (wrows, g1) window at dynamic woff
                rows_abs = (base + woff).astype(jnp.float32) + arow
                w = _hat(dix0, rows_abs) * _hat(dix1, bcol)  # (T, wrows*g1)
                tab = tab_ref[pl.ds(woff, wrows)]  # (wrows, g1p, g2p)
                pencil = jax.lax.dot_general(
                    w.astype(jnp.bfloat16),
                    tab.reshape(wrows * g1p, g2p),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (T, g2p)
                out_ref[0, :, d * c : (d + 1) * c] = _fold_k(
                    pencil, dix2, kvalid, kidx, fold, c, g2, g2p, tile
                )

    return kernel


def _fold_k(pencil, dix2, kvalid, kidx, fold, c, g2, g2p, tile):
    """Axis-2 interpolation of a (T, g2p) pencil down to (T, c) features.

    C == 128 (vreg lane width): the k axis is a static loop of lane-ALIGNED
    128-wide pencil slices FMA'd on the VPU with per-query hat weights —
    2*g2*T*128 VPU flops instead of the 2*T*g2p*C fold matmul (the dominant
    cost on the two C=128 pyramid levels: 3.2 + 1.6 MFLOP/point of the
    1-D kernel's 39.4 total at full dims), and f32 throughout (the matmul
    fold rounds the pencil to bf16).  Other C: the constant 0/1 fold matmul
    (k-major lane layout makes a VPU reduction a relayout there)."""
    if c == 128 and g2p == g2 * c:
        feat = pencil[:, :c] * _hat(dix2, 0.0)
        for k in range(1, g2):
            feat += pencil[:, k * c : (k + 1) * c] * _hat(dix2, float(k))
        return feat
    h2 = jnp.where(kvalid, _hat(dix2, kidx), 0.0)
    return jax.lax.dot_general(
        (pencil * h2).astype(jnp.bfloat16),
        fold,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (T, c)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "align_corners", "displacement", "g0_fine",
                     "tile", "interpret"),
)
def level_features(
    vol: jnp.ndarray,
    q0: jnp.ndarray,
    q1: jnp.ndarray,
    q2: jnp.ndarray,
    tile_slab: jnp.ndarray,
    tile_used: jnp.ndarray,
    dims: tuple,
    g0_fine: int,
    align_corners: bool,
    displacement: float,
    tile: int = TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """Interpolate one pyramid level at bucketed queries.

    vol: (B, g0, g1, g2, C) float volume; q*: (B, P) padded coords from
    bucket_queries; tile_slab: (B, NT).  Returns (B, P, 7*C) float32 features
    in displacement-major-within-level order.
    """
    b, g0, g1, g2, c = vol.shape
    p = q0.shape[1]
    nt = p // tile
    g2c = g2 * c
    g2p = -(-g2c // 128) * 128  # pad the (k, c) lane axis to the vreg width
    g1p = -(-g1 // 8) * 8  # pad axis 1 to the sublane tiling (DMA alignment);
    # padded rows are zero, and zero data kills any stray hat weight

    tab_lo, woff_np, rows, wrows = _level_windows(
        g0_fine, dims, align_corners, displacement
    )
    tile_base = jnp.asarray(tab_lo)[tile_slab]  # (B, NT)
    # (B, 3, NT): the tiny axis leads so SMEM tiling pads (3, NT), not (NT, 128)
    tile_woff = jnp.moveaxis(jnp.asarray(woff_np)[tile_slab], -1, 1)

    volp = vol.astype(jnp.bfloat16).reshape(b, g0, g1, g2c)
    if g2p != g2c or g1p != g1:
        volp = jnp.pad(
            volp, ((0, 0), (0, 0), (0, g1p - g1), (0, g2p - g2c))
        )
    # lane index k*C + c (k-major): stack g2 identity blocks
    fold = jnp.asarray(
        np.tile(np.eye(c, dtype=np.float32), (g2, 1)), jnp.bfloat16
    )
    fold = jnp.pad(fold, ((0, g2p - g2c), (0, 0)))

    kernel = _make_kernel(
        dims, c, g2p, g1p, rows, wrows, align_corners, displacement, tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # tile_base, tile_woff, tile_used
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume (DMA'd manually)
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fold matrix
        ],
        out_specs=pl.BlockSpec((1, tile, 7 * c), lambda bi, ti, *_: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, g1p, g2p), jnp.bfloat16),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 7 * c), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * 7 * (wrows * g1 + g2c) * max(c, 1),
            bytes_accessed=b * nt * rows * g1 * g2p * 2 + b * p * 7 * c * 4,
            transcendentals=0,
        ),
    )(
        tile_base,
        tile_woff,
        tile_used,
        volp,
        q0[..., None],
        q1[..., None],
        q2[..., None],
        fold,
    )
    return out


def _make_kernel_banded(dims, c: int, g2p: int, wcols: int, rows: int,
                        wrows: int, align_corners: bool, displacement: float,
                        tile: int):
    """Banded kernel body: like _make_kernel but the table window is a
    (rows, WCOLS) axis-0 x axis-1 tile instead of full axis-1 rows, so the
    pencil contraction K drops from wrows*g1p to wrows*WCOLS."""
    g0, g1, g2 = (int(d) for d in dims)
    a0, b0 = _ix_affine(g0, align_corners)
    a1, b1 = _ix_affine(g1, align_corners)
    a2, b2 = _ix_affine(g2, align_corners)
    dsh = (displacement * a0, displacement * a1, displacement * a2)

    def kernel(base_ref, woff_ref, cbase_ref, used_ref, vol_ref, q0_ref,
               q1_ref, q2_ref, fold_ref, out_ref, tab_ref, state_ref, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        base = base_ref[bi, ti]
        # cbase_ref holds the window start DIVIDED by 8: multiplying here
        # lets Mosaic PROVE the dynamic sublane-dim slice offset is
        # 8-divisible (a raw prefetched value fails "tile index in dimension
        # 2 is divisible by the tiling (8)" at compile time on real TPUs,
        # even though _band_windows only ever emits 8-aligned starts).
        cbase = cbase_ref[bi, ti] * 8

        @pl.when(jnp.logical_and(ti == 0, bi == 0))
        def _():
            state_ref[0] = -1
            state_ref[1] = -1
            state_ref[2] = -1

        skip = used_ref[bi, ti] == 0

        @pl.when(skip)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])  # bf16 zeros

        @pl.when(
            jnp.logical_and(
                jnp.logical_not(skip),
                (state_ref[0] != base)
                | (state_ref[1] != cbase)
                | (state_ref[2] != bi),
            )
        )
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[bi, pl.ds(base, rows), pl.ds(cbase, wcols)],
                tab_ref, sem,
            )
            dma.start()
            dma.wait()
            state_ref[0] = base
            state_ref[1] = cbase
            state_ref[2] = bi

        p0 = q0_ref[0]  # (T, 1)
        p1 = q1_ref[0]
        p2 = q2_ref[0]
        ix0 = a0 * p0 + b0
        ix1 = a1 * p1 + b1
        ix2 = a2 * p2 + b2

        ab = jax.lax.broadcasted_iota(jnp.int32, (tile, wrows * wcols), 1)
        arow = (ab // wcols).astype(jnp.float32)
        bcol = (ab % wcols).astype(jnp.float32)
        cols_abs = cbase.astype(jnp.float32) + bcol
        kidx = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, g2p), 1) // c
        ).astype(jnp.float32)
        kvalid = kidx < float(g2)

        fold = fold_ref[:, :]

        @pl.when(jnp.logical_not(skip))
        def _compute():
            for d, (s0, s1, s2) in enumerate(DISPLACEMENTS):
                woff = woff_ref[bi, s0 + 1, ti]
                dix0 = ix0 + s0 * dsh[0]
                dix1 = ix1 + s1 * dsh[1]
                dix2 = ix2 + s2 * dsh[2]
                rows_abs = (base + woff).astype(jnp.float32) + arow
                w = _hat(dix0, rows_abs) * _hat(dix1, cols_abs)
                tab = tab_ref[pl.ds(woff, wrows)]  # (wrows, wcols, g2p)
                pencil = jax.lax.dot_general(
                    w.astype(jnp.bfloat16),
                    tab.reshape(wrows * wcols, g2p),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (T, g2p)
                out_ref[0, :, d * c : (d + 1) * c] = _fold_k(
                    pencil, dix2, kvalid, kidx, fold, c, g2, g2p, tile
                ).astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14)
)
def level_features_banded(
    vol: jnp.ndarray,
    q0: jnp.ndarray,
    q1: jnp.ndarray,
    q2: jnp.ndarray,
    tile_slab: jnp.ndarray,
    tile_band: jnp.ndarray,
    tile_used: jnp.ndarray,
    dims: tuple,
    g0_fine: int,
    g1_fine: int,
    align_corners: bool,
    displacement: float,
    band_cols: int,
    tile: int = TILE,
    interpret: bool = False,
) -> jnp.ndarray:
    """level_features over a 2-D (slab, band) bucketing from
    bucket_queries_2d.  Same semantics but returns BFLOAT16 features (the
    fc0 consumer casts to bf16 regardless, and halving the multi-GB feature
    write/read is measured HBM-bandwidth win); ~2x fewer issued matmul FLOPs
    at full dims (K = wrows*WCOLS instead of wrows*g1p on the full-res
    levels).  INFERENCE-ONLY: differentiating it raises NotImplementedError
    (training's fused path keeps the 1-D bucketing of level_features_diff,
    which has a full VJP)."""
    return _level_features_banded_impl(
        vol, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine,
        g1_fine, align_corners, displacement, band_cols, tile, interpret,
    )


def _lfb_fwd(vol, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine,
             g1_fine, align_corners, displacement, band_cols, tile, interpret):
    out = _level_features_banded_impl(
        vol, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine,
        g1_fine, align_corners, displacement, band_cols, tile, interpret,
    )
    return out, None


def _lfb_bwd(dims, g0_fine, g1_fine, align_corners, displacement, band_cols,
             tile, interpret, residuals, cotangent):
    raise NotImplementedError(
        "level_features_banded (the bands= 2-D bucketed point-query kernel) "
        "is INFERENCE-ONLY: it has no backward kernel.  For training/"
        "gradients use the 1-D bucketed path (bands=None), which routes "
        "through level_features_diff and its custom VJP."
    )


level_features_banded.defvjp(_lfb_fwd, _lfb_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "align_corners", "displacement", "g0_fine",
                     "g1_fine", "band_cols", "tile", "interpret"),
)
def _level_features_banded_impl(
    vol, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine: int,
    g1_fine: int, align_corners: bool, displacement: float, band_cols: int,
    tile: int = TILE, interpret: bool = False,
) -> jnp.ndarray:
    b, g0, g1, g2, c = vol.shape
    p = q0.shape[1]
    nt = p // tile
    g2c = g2 * c
    g2p = -(-g2c // 128) * 128
    g1p = -(-g1 // 8) * 8

    tab_lo, woff_np, rows, wrows = _level_windows(
        g0_fine, dims, align_corners, displacement
    )
    col_lo, wcols = _band_windows(
        g1_fine, dims, align_corners, displacement, band_cols
    )
    tile_base = jnp.asarray(tab_lo)[tile_slab]  # (B, NT)
    tile_woff = jnp.moveaxis(jnp.asarray(woff_np)[tile_slab], -1, 1)  # (B,3,NT)
    # stored /8 so the kernel reconstructs the offset as <prefetched>*8,
    # which Mosaic can prove 8-divisible for the sublane-dim memref slice
    tile_cbase = jnp.asarray(col_lo // 8)[tile_band]  # (B, NT)

    volp = vol.astype(jnp.bfloat16).reshape(b, g0, g1, g2c)
    if g2p != g2c or g1p != g1:
        volp = jnp.pad(
            volp, ((0, 0), (0, 0), (0, g1p - g1), (0, g2p - g2c))
        )
    fold = jnp.asarray(
        np.tile(np.eye(c, dtype=np.float32), (g2, 1)), jnp.bfloat16
    )
    fold = jnp.pad(fold, ((0, g2p - g2c), (0, 0)))

    kernel = _make_kernel_banded(
        dims, c, g2p, wcols, rows, wrows, align_corners, displacement, tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tile_base, tile_woff, tile_cbase, tile_used
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume (DMA'd manually)
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fold matrix
        ],
        out_specs=pl.BlockSpec((1, tile, 7 * c), lambda bi, ti, *_: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wcols, g2p), jnp.bfloat16),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # bf16 output: the consumer (fc0) casts to bf16 anyway, and at 262k
    # queries the six levels' feature outputs total ~2.7 GB in f32 — halving
    # the write (and the fc0 read) is pure HBM-bandwidth win on this
    # inference-only path (training's 1-D kernel keeps f32 for its VJP).
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, 7 * c), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * 7 * (wrows * wcols + g2c) * max(c, 1),
            bytes_accessed=b * nt * rows * wcols * g2p * 2 + b * p * 7 * c * 2,
            transcendentals=0,
        ),
    )(
        tile_base,
        tile_woff,
        tile_cbase,
        tile_used,
        volp,
        q0[..., None],
        q1[..., None],
        q2[..., None],
        fold,
    )
    return out


def _make_kernel_banded_fc0(dims, c: int, g2p: int, wcols: int, rows: int,
                            wrows: int, align_corners: bool,
                            displacement: float, tile: int, h_dim: int,
                            wcols_k: int | None = None):
    """Banded kernel body with the level's fc0 partial product FUSED: instead
    of writing (T, 7*C) interpolated features to HBM (to be concatenated and
    contracted by XLA), the 7 displacement features accumulate into a VMEM
    scratch and one (T, 7C) x (7C, H) matmul per tile emits this level's
    fc0 partial (T, H) directly.  At 262k queries this deletes ~1.35 GB of
    bf16 feature write+read plus the per-level XLA einsums (~7.5 ms
    profiled), while the fc0 matmul itself lands on MXU time the kernel was
    stalling through anyway (K = 7C is tile-friendly: 112/224/448/896).

    wcols_k (col_shift=True): contract only a per-displacement (wrows,
    wcols_k) sub-window of the DMA'd (rows, wcols) table, sliced at the
    prefetched 8-aligned offset coff — the K-fill geometry experiment
    (_band_windows_disp).  The DMA and its state caching are unchanged."""
    g0, g1, g2 = (int(d) for d in dims)
    a0, b0 = _ix_affine(g0, align_corners)
    a1, b1 = _ix_affine(g1, align_corners)
    a2, b2 = _ix_affine(g2, align_corners)
    dsh = (displacement * a0, displacement * a1, displacement * a2)
    wk = wcols if wcols_k is None else wcols_k

    def body(base_ref, woff_ref, cbase_ref, coff_ref, used_ref, vol_ref,
             q0_ref, q1_ref, q2_ref, fold_ref, w0_ref, out_ref, tab_ref,
             feat_ref, state_ref, sem):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        base = base_ref[bi, ti]
        cbase = cbase_ref[bi, ti] * 8  # see _make_kernel_banded

        @pl.when(jnp.logical_and(ti == 0, bi == 0))
        def _():
            state_ref[0] = -1
            state_ref[1] = -1
            state_ref[2] = -1

        skip = used_ref[bi, ti] == 0

        @pl.when(skip)
        def _():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        @pl.when(
            jnp.logical_and(
                jnp.logical_not(skip),
                (state_ref[0] != base)
                | (state_ref[1] != cbase)
                | (state_ref[2] != bi),
            )
        )
        def _():
            dma = pltpu.make_async_copy(
                vol_ref.at[bi, pl.ds(base, rows), pl.ds(cbase, wcols)],
                tab_ref, sem,
            )
            dma.start()
            dma.wait()
            state_ref[0] = base
            state_ref[1] = cbase
            state_ref[2] = bi

        p0 = q0_ref[0]  # (T, 1)
        p1 = q1_ref[0]
        p2 = q2_ref[0]
        ix0 = a0 * p0 + b0
        ix1 = a1 * p1 + b1
        ix2 = a2 * p2 + b2

        ab = jax.lax.broadcasted_iota(jnp.int32, (tile, wrows * wk), 1)
        arow = (ab // wk).astype(jnp.float32)
        bcol = (ab % wk).astype(jnp.float32)
        kidx = (
            jax.lax.broadcasted_iota(jnp.int32, (tile, g2p), 1) // c
        ).astype(jnp.float32)
        kvalid = kidx < float(g2)

        fold = fold_ref[:, :]

        @pl.when(jnp.logical_not(skip))
        def _compute():
            for d, (s0, s1, s2) in enumerate(DISPLACEMENTS):
                woff = woff_ref[bi, s0 + 1, ti]
                dix0 = ix0 + s0 * dsh[0]
                dix1 = ix1 + s1 * dsh[1]
                dix2 = ix2 + s2 * dsh[2]
                rows_abs = (base + woff).astype(jnp.float32) + arow
                if coff_ref is None:
                    coff = 0
                else:
                    coff = coff_ref[bi, s1 + 1, ti] * 8
                cols_abs = (cbase + coff).astype(jnp.float32) + bcol
                w = _hat(dix0, rows_abs) * _hat(dix1, cols_abs)
                tab = tab_ref[pl.ds(woff, wrows), pl.ds(coff, wk)]
                pencil = jax.lax.dot_general(
                    w.astype(jnp.bfloat16),
                    tab.reshape(wrows * wk, g2p),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (T, g2p)
                feat_ref[:, d * c : (d + 1) * c] = _fold_k(
                    pencil, dix2, kvalid, kidx, fold, c, g2, g2p, tile
                ).astype(jnp.bfloat16)
            out_ref[0] = jax.lax.dot_general(
                feat_ref[:, :],
                w0_ref[:, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)  # (T, H) fc0 partial

    if wcols_k is None:
        def kernel(base_ref, woff_ref, cbase_ref, used_ref, *rest):
            body(base_ref, woff_ref, cbase_ref, None, used_ref, *rest)
    else:
        kernel = body
    return kernel


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16)
)
def level_fc0_banded(
    vol: jnp.ndarray,
    w0l: jnp.ndarray,
    q0: jnp.ndarray,
    q1: jnp.ndarray,
    q2: jnp.ndarray,
    tile_slab: jnp.ndarray,
    tile_band: jnp.ndarray,
    tile_used: jnp.ndarray,
    dims: tuple,
    g0_fine: int,
    g1_fine: int,
    align_corners: bool,
    displacement: float,
    band_cols: int,
    tile: int = TILE,
    interpret: bool = False,
    col_shift: bool = False,
) -> jnp.ndarray:
    """level_features_banded with the level's fc0 partial fused in-kernel.

    w0l: (7*C, H) bf16 fc0 weight block for this level, rows ordered
    displacement-major-within-level (d*C + c).  Returns the (B, P, H)
    bfloat16 partial product sum_f feat[..., f] * w0l[f, :] — the caller
    sums level partials and adds the fc0 bias.  INFERENCE-ONLY (no VJP),
    like level_features_banded.

    col_shift: contract per-displacement column sub-windows instead of the
    union window (the K-fill geometry experiment; _band_windows_disp)."""
    return _level_fc0_banded_impl(
        vol, w0l, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine,
        g1_fine, align_corners, displacement, band_cols, tile, interpret,
        col_shift,
    )


def _lf0_fwd(vol, w0l, q0, q1, q2, tile_slab, tile_band, tile_used, dims,
             g0_fine, g1_fine, align_corners, displacement, band_cols, tile,
             interpret, col_shift):
    out = _level_fc0_banded_impl(
        vol, w0l, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine,
        g1_fine, align_corners, displacement, band_cols, tile, interpret,
        col_shift,
    )
    return out, None


def _lf0_bwd(dims, g0_fine, g1_fine, align_corners, displacement, band_cols,
             tile, interpret, col_shift, residuals, cotangent):
    raise NotImplementedError(
        "level_fc0_banded (the fc0-fused banded point-query kernel) is "
        "INFERENCE-ONLY: it has no backward kernel.  For training/gradients "
        "use the 1-D bucketed path (bands=None), which routes through "
        "level_features_diff and its custom VJP."
    )


level_fc0_banded.defvjp(_lf0_fwd, _lf0_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "align_corners", "displacement", "g0_fine",
                     "g1_fine", "band_cols", "tile", "interpret", "col_shift"),
)
def _level_fc0_banded_impl(
    vol, w0l, q0, q1, q2, tile_slab, tile_band, tile_used, dims, g0_fine: int,
    g1_fine: int, align_corners: bool, displacement: float, band_cols: int,
    tile: int = TILE, interpret: bool = False, col_shift: bool = False,
) -> jnp.ndarray:
    b, g0, g1, g2, c = vol.shape
    p = q0.shape[1]
    nt = p // tile
    g2c = g2 * c
    g2p = -(-g2c // 128) * 128
    g1p = -(-g1 // 8) * 8
    assert w0l.shape[0] == 7 * c, (w0l.shape, c)
    h_dim = w0l.shape[1]

    tab_lo, woff_np, rows, wrows = _level_windows(
        g0_fine, dims, align_corners, displacement
    )
    col_lo, wcols = _band_windows(
        g1_fine, dims, align_corners, displacement, band_cols
    )
    tile_base = jnp.asarray(tab_lo)[tile_slab]
    tile_woff = jnp.moveaxis(jnp.asarray(woff_np)[tile_slab], -1, 1)
    tile_cbase = jnp.asarray(col_lo // 8)[tile_band]
    wcols_k = None
    if col_shift:
        coff_np, wcols_k = _band_windows_disp(
            g1_fine, dims, align_corners, displacement, band_cols
        )
        # (B, 3, NT): per-tile sub-window offsets/8 per axis-1 displacement
        tile_coff = jnp.moveaxis(jnp.asarray(coff_np)[tile_band], -1, 1)

    volp = vol.astype(jnp.bfloat16).reshape(b, g0, g1, g2c)
    if g2p != g2c or g1p != g1:
        volp = jnp.pad(
            volp, ((0, 0), (0, 0), (0, g1p - g1), (0, g2p - g2c))
        )
    fold = jnp.asarray(
        np.tile(np.eye(c, dtype=np.float32), (g2, 1)), jnp.bfloat16
    )
    fold = jnp.pad(fold, ((0, g2p - g2c), (0, 0)))

    kernel = _make_kernel_banded_fc0(
        dims, c, g2p, wcols, rows, wrows, align_corners, displacement, tile,
        h_dim, wcols_k,
    )
    wk = wcols if wcols_k is None else wcols_k
    prefetch = [tile_base, tile_woff, tile_cbase]
    if col_shift:
        prefetch.append(tile_coff)
    prefetch.append(tile_used)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        # tile_base, tile_woff, tile_cbase, [tile_coff,] tile_used
        num_scalar_prefetch=len(prefetch),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # volume (DMA'd manually)
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda bi, ti, *_: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fold matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0 level block
        ],
        out_specs=pl.BlockSpec((1, tile, h_dim), lambda bi, ti, *_: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, wcols, g2p), jnp.bfloat16),
            pltpu.VMEM((tile, 7 * c), jnp.bfloat16),
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, h_dim), jnp.bfloat16),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * (7 * (wrows * wk + g2c) * max(c, 1)
                               + 7 * c * h_dim),
            bytes_accessed=b * nt * rows * wcols * g2p * 2
            + b * p * h_dim * 2,
            transcendentals=0,
        ),
    )(
        *prefetch,
        volp,
        q0[..., None],
        q1[..., None],
        q2[..., None],
        fold,
        w0l.astype(jnp.bfloat16),
    )
    return out


def default_interpret() -> bool:
    return jax.default_backend() != "tpu"
