"""Static issued-FLOP cost model for the fused arbitrary-point query kernel.

Mirrors the exact static matmul shapes of `point_query.py` (per tile of
`tile` queries, per displacement copy: pencil K = wrows * g1p [1-D] or
wrows * wcols [banded], N = pad128(g2*C); plus the axis-2 fold — a (g2p, C)
matmul, or a g2-step VPU FMA loop on unpadded C=128 levels), so band-count
decisions and ARCHITECTURE.md §9's ceiling analysis are regenerated from one
source instead of hand-derived.  Pure host math, no TPU needed; the CLI
report lives in scripts/flops_points.py.

The model predicts e.g. 36.5 MFLOP/pt for 1-D slabs vs 16.1 MFLOP/pt for
bands=8 at full IF-Net-128 dims, and bands=4 as the half-scale optimum —
`choose_bands` picks the argmin for a given config (used by
`evaluate_points(bands="auto")`).
"""

from __future__ import annotations

import numpy as np

from sv3d_tpu.ops.pallas.point_query import (
    SLAB_FINE_ROWS,
    _band_windows,
    _band_windows_disp,
    _ix_affine,
    _level_windows,
    _num_slabs,
)


def level_dims(dims, n_levels):
    """Pyramid dims: the raw grid (L0), each conv stage's PRE-POOL output
    (reference samples features before every maxpool, model/ifnet.py:93-120;
    sv3d_tpu IFNet.encode), with VALID floor 2x pooling between stages —
    so L1 sits at FULL resolution and L_{i>=2} at floor-halved dims."""
    out = [tuple(dims), tuple(dims)]
    d = tuple(dims)
    for _ in range(n_levels - 2):
        d = tuple(max(x // 2, 1) for x in d)
        out.append(d)
    return out


def pad8(x):
    return -(-x // 8) * 8


def pad128(x):
    return -(-x // 128) * 128


def kernel_costs(cfg, full_dims, bands: int, col_shift: bool = False):
    """Per-REAL-point MXU/VPU flops by level (pad-slot factor applied
    separately by `pad_amplification`).

    Returns (rows, mxu_total, vpu_total, mlp_per_slot) where rows is a list
    of (name, K, N, mxu_flops_per_pt, vpu_flops_per_pt).

    col_shift: model the per-displacement column sub-window variant
    (K = wrows * wcols_k from _band_windows_disp)."""
    chans = cfg.feature_channels
    ldims = level_dims(full_dims, len(chans))
    g0f, g1f = ldims[0][0], ldims[0][1]
    rows_out = []
    mxu = vpu = 0.0
    for (dims, c) in zip(ldims, chans):
        _, _, _, wrows = _level_windows(
            g0f, dims, cfg.align_corners, cfg.displacement
        )
        g2c = dims[2] * c
        g2p = pad128(g2c)
        if bands:
            if col_shift:
                _, wcols = _band_windows_disp(
                    g1f, dims, cfg.align_corners, cfg.displacement, bands
                )
            else:
                _, wcols = _band_windows(
                    g1f, dims, cfg.align_corners, cfg.displacement, bands
                )
            k = wrows * wcols
        else:
            k = wrows * pad8(dims[1])
        pencil = 2.0 * k * g2p * 7
        if c == 128 and g2p == g2c:
            fold_mxu, fold_vpu = 0.0, 2.0 * dims[2] * c * 7
        else:
            fold_mxu, fold_vpu = 2.0 * g2p * c * 7, 0.0
        rows_out.append((f"{dims} C={c}", k, g2p, pencil + fold_mxu, fold_vpu))
        mxu += pencil + fold_mxu
        vpu += fold_vpu
    sum_c = sum(chans)
    h = cfg.hidden_dim
    hidden = (h, h, h) if cfg.net_res == 128 else (2 * h, h, h)
    widths = [7 * sum_c] + list(hidden) + [1]
    mlp = sum(2.0 * a * b for a, b in zip(widths[:-1], widths[1:]))
    return rows_out, mxu, vpu, mlp


def pad_amplification(cfg, full_dims, bands: int, tile: int, n: int,
                      seed: int = 0):
    """Simulate the counting-bucketing of n uniform queries: fraction of
    compute-tile slots that are padding (they pay pencil+fold+MLP), plus the
    all-padding tiles that skip compute entirely."""
    rng = np.random.default_rng(seed)
    g0f, g1f = full_dims[0], full_dims[1]
    p = rng.uniform(-1.0, 1.0, size=(2, n))  # [-1, 1] coords (2x of points)
    a0, b0 = _ix_affine(g0f, cfg.align_corners)
    ns0 = _num_slabs(g0f)
    slab = np.clip(
        np.floor((a0 * p[0] + b0) / SLAB_FINE_ROWS).astype(int), 0, ns0 - 1
    )
    if bands:
        a1, b1 = _ix_affine(g1f, cfg.align_corners)
        nb1 = max(1, -(-g1f // bands))
        band = np.clip(
            np.floor((a1 * p[1] + b1) / bands).astype(int), 0, nb1 - 1
        )
        bucket = slab * nb1 + band
        nb = ns0 * nb1
    else:
        bucket, nb = slab, ns0
    counts = np.bincount(bucket, minlength=nb)
    compute_slots = (np.maximum(-(-counts // tile), 1) * tile)[counts > 0].sum()
    empty_tiles = int((counts == 0).sum())
    return compute_slots / n, empty_tiles


def issued_flops_per_point(cfg, full_dims, bands: int, tile: int = 128,
                           n: int = 65536, col_shift: bool = False) -> float:
    """Total issued MXU FLOPs per real point, pad-slot amplification
    included.  NOTE: hardware showed this alone does NOT order throughput —
    the banded kernels' short contraction K wastes MXU K-tiles.  Use
    predicted_sec_per_point for band selection; this stays as the
    issued-work denominator for achieved-TFLOP reporting
    (scripts/bands_sweep.py)."""
    _, mxu, _, mlp = kernel_costs(cfg, full_dims, bands, col_shift)
    amp, _ = pad_amplification(cfg, full_dims, bands, tile, n)
    return (mxu + mlp) * amp


# --- measured-time model ----------------------------------------------------
# The MXU contracts K in 128-deep passes, so a matmul with K = 168 issues two
# passes but fills only 168/256 of them: effective time scales with
# flops / ktile_efficiency(K).  Calibrated on the v5e (2026-08-19,
# scripts/bands_sweep.py, 262k queries, full IF-Net-128 dims) the model
# predicts the measured wall times to ~±5% and — unlike the raw issued-FLOP
# model — reproduces the measured ordering (bands 12/16 fastest, then 8/24,
# then 4, 1-D slowest):
#   bands:      0      4      8     12     16     24
#   measured: 86.4   66.0   64.5   61.3   60.9   64.4  ms
#   model:    86.4   69.8   63.2   61.0   60.9   64.0  ms
MXU_K_TILE = 128
EFFECTIVE_PEAK_FLOPS = 182e12   # fitted slope ~= bf16 MXU peak minus losses
OVERHEAD_SEC_PER_POINT = 0.9e-7  # bucketing, hidden MLP layers, DMA, writes


def ktile_efficiency(k: int) -> float:
    """Fraction of the MXU's K-passes a K-deep contraction actually fills."""
    return k / (-(-k // MXU_K_TILE) * MXU_K_TILE)


def predicted_sec_per_point(cfg, full_dims, bands: int, tile: int = 128,
                            n: int = 65536, col_shift: bool = False) -> float:
    """Predicted seconds per real query point on the calibrated v5e model:
    K-tile-efficiency-weighted kernel flops + MLP flops, pad-amplified, at
    the fitted effective rate, plus the fitted fixed per-point overhead.
    Calibration constants are chip-specific; the ORDERING (what choose_bands
    needs) is robust to rescaling either constant by ~2x."""
    rows, _, _, mlp = kernel_costs(cfg, full_dims, bands, col_shift)
    eff_flops = sum(mx / ktile_efficiency(k) for _, k, _, mx, _ in rows)
    amp, _ = pad_amplification(cfg, full_dims, bands, tile, n)
    return ((eff_flops + mlp) * amp) / EFFECTIVE_PEAK_FLOPS + (
        OVERHEAD_SEC_PER_POINT
    )


def choose_bands(cfg, full_dims, candidates=(0, 4, 8, 12, 16, 24, 32),
                 tile: int = 128, n: int = 65536) -> int | None:
    """Band count minimizing PREDICTED TIME (predicted_sec_per_point) for
    this config; returns None for the 1-D slab path (bands=0 winner or
    degenerate axis-1).

    Resolves `evaluate_points(bands="auto")`.  Pass the REAL query count as
    `n` — the optimum shifts with it (finer bucketing cuts the pencil K but
    pads more of each 128-slot tile when points-per-bucket drops).  The
    time model is hardware-calibrated (see above) and reproduced the
    measured ordering at 262k full-dims queries; explicit `bands=`
    overrides it."""
    g1f = full_dims[1]
    best, best_cost = None, float("inf")
    for b in candidates:
        if b and b >= g1f:  # one band == the 1-D path, skip duplicates
            continue
        cost = predicted_sec_per_point(cfg, full_dims, b, tile, n)
        if cost < best_cost:
            best, best_cost = b, cost
    return best if best else None
