"""CLI report over the static issued-FLOP cost model of the fused
arbitrary-point query kernel (sv3d_tpu/ops/pallas/cost.py) — regenerate
ARCHITECTURE.md §9's ceiling analysis after any kernel change.  Pure host
math, no TPU needed.

Usage:
  python scripts/flops_points.py [--net_res 128] [--scale_factor 1]
      [--bands 0 8] [--n 262144] [--tile 128]

Reports per-level and total MXU MFLOP/point and VPU MFLOP/point, plus the
pad-slot amplification for N uniform queries (padded slots still pay the
MLP; pure-padding tiles skip all compute), and the model's `choose_bands`
pick for the config.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from sv3d_tpu.config import Config  # noqa: E402
from sv3d_tpu.ops.pallas.cost import (  # noqa: E402
    choose_bands,
    kernel_costs,
    pad_amplification,
)


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
        rows, mxu, vpu, mlp = kernel_costs(cfg, full_dims, bands)
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

    print(f"\nchoose_bands pick for this config at n={args.n}: "
          f"{choose_bands(cfg, full_dims, tile=args.tile, n=args.n)}")


if __name__ == "__main__":
    main()
