"""Static issued-FLOP accounting for the fused arbitrary-point query kernel.

Mirrors the exact static matmul shapes of sv3d_tpu/ops/pallas/point_query.py
(per tile of `tile` queries, per displacement copy: pencil K = wrows * g1p
[1-D] or wrows * wcols [banded], N = pad128(g2*C); plus the axis-2 fold —
a (g2p, C) matmul, or a g2-step VPU FMA loop on unpadded C=128 levels)
so ARCHITECTURE.md §9's ceiling analysis can be regenerated after kernel
changes instead of hand-derived.  Pure host math, no TPU needed.

Usage:
  python scripts/flops_points.py [--net_res 128] [--scale_factor 1]
      [--bands 0 8] [--n 262144] [--tile 128]

Reports per-level and total MXU MFLOP/point and VPU MFLOP/point, plus the
pad-slot amplification for N uniform queries (padded slots still pay the
MLP; pure-padding tiles skip all compute).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from sv3d_tpu.config import Config  # noqa: E402
from sv3d_tpu.ops.pallas.point_query import (  # noqa: E402
    SLAB_FINE_ROWS,
    _band_windows,
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


def kernel_costs(cfg, full_dims, bands: int, tile: int):
    """Per-REAL-point MXU/VPU flops by level (pad-slot factor applied later).

    Returns (rows, mxu_total, vpu_total, mlp_per_slot) where rows is a list of
    (name, K, N, mxu_flops_per_pt, vpu_flops_per_pt)."""
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net_res", type=int, default=128)
    ap.add_argument("--scale_factor", type=int, default=1)
    ap.add_argument("--bands", type=int, nargs="*", default=[0, 8])
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--tile", type=int, default=128)
    args = ap.parse_args()

    top = Config(net_res=args.net_res, scale_factor=args.scale_factor)
    cfg, full_dims = top.ifnet(), tuple(top.dims)

    for bands in args.bands:
        label = f"bands={bands}" if bands else "1-D slabs"
        rows, mxu, vpu, mlp = kernel_costs(cfg, full_dims, bands, args.tile)
        amp, empty = pad_amplification(
            cfg, full_dims, bands, args.tile, args.n
        )
        print(f"\n== {label} (dims {full_dims}, net_res {args.net_res}, "
              f"N={args.n}) ==")
        for name, k, npad, fmxu, fvpu in rows:
            print(f"  level {name:24s} K={k:5d} N={npad:5d} "
                  f"MXU {fmxu / 1e6:6.2f} MFLOP/pt  VPU {fvpu / 1e6:5.3f}")
        print(f"  MLP per slot: {mlp / 1e6:.2f} MFLOP")
        total = (mxu + mlp) * amp
        print(f"  interp MXU {mxu / 1e6:.1f} + MLP {mlp / 1e6:.1f} "
              f"= {(mxu + mlp) / 1e6:.1f} MFLOP/pt x pad-slot amp {amp:.3f} "
              f"= {total / 1e6:.1f} MFLOP/pt issued "
              f"(VPU {vpu * amp / 1e6:.3f}; {empty} all-pad tiles skipped)")
        peak = 197e12  # v5e bf16 MXU peak
        print(f"  speed-of-light at 100%/55% MXU: "
              f"{peak / total / 1e6:.1f} / {0.55 * peak / total / 1e6:.1f} "
              f"M pts/s")


if __name__ == "__main__":
    main()
