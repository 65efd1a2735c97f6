"""Hardware sweep of the fused arbitrary-point kernel's band counts.

Measures device-resident points/s at full IF-Net-128 dims for bands in
{None (1-D slabs), 4, 8, 16} at a given query count, and prints one JSON
line.  The numbers calibrate the measured-efficiency term of the cost model
(ops/pallas/cost.py): the issued-FLOP model alone predicts 2.3x less work
for bands=8 but hardware delivered +19% (BENCH_r03), i.e. the banded kernel
is not FLOP-bound — band selection must optimize predicted TIME.

Usage: python scripts/bands_sweep.py [--n 262144] [--bands 0,4,8,16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

DIMS = (139, 104, 112)
N_TIMED = 3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--bands", default="0,4,8,16",
                   help="comma list; 0 = the 1-D slab path")
    p.add_argument("--col_shift", action="store_true",
                   help="per-displacement column sub-windows (the K-fill "
                   "geometry experiment, _band_windows_disp): contraction K "
                   "drops to wrows*wcols_k at the same band_cols")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.ops.pallas.cost import issued_flops_per_point

    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, grid, jnp.zeros((1, 8, 3)), train=False)
    )(rng)
    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    pts = jax.random.uniform(rng, (1, args.n, 3), jnp.float32, -0.45, 0.45)

    trivial = jax.jit(lambda x: x + 1.0)
    _ = trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = trivial(jnp.zeros(())).item()
    rt = (time.perf_counter() - t0) / 5

    cfg = IFNetConfig.for_net_res(128)
    out = {"n": args.n, "dims": DIMS, "col_shift": args.col_shift,
           "results": {}}
    for b in (int(x) for x in args.bands.split(",")):
        bands = None if b == 0 else b
        query = jax.jit(
            lambda v, lv, p, _bands=bands: jax.nn.sigmoid(
                model.apply(v, lv, p, mesh="local", bands=_bands,
                            col_shift=args.col_shift,
                            method=IFNet.query_fused)
            )
        )

        def run():
            return float(jnp.sum(query(variables, levels, pts)[0, :8]))

        try:
            run(); run()
            times = []
            for _ in range(N_TIMED):
                t0 = time.perf_counter()
                run()
                times.append(time.perf_counter() - t0 - rt)
            pps = args.n / min(times)
            mflop_pt = issued_flops_per_point(cfg, DIMS, b, n=args.n) / 1e6
            out["results"][str(b)] = {
                "points_per_sec": round(pps, 1),
                "ms": round(min(times) * 1e3, 2),
                "issued_mflop_per_pt": round(mflop_pt, 2),
                # achieved MXU+VPU throughput on the ISSUED work
                "achieved_tflops": round(pps * mflop_pt / 1e6, 1),
            }
            print(f"# bands={b}: {pps/1e6:.2f}M pts/s, "
                  f"{out['results'][str(b)]['achieved_tflops']} TFLOP/s issued",
                  file=sys.stderr, flush=True)
        except Exception as e:  # pragma: no cover - hardware-dependent
            out["results"][str(b)] = {"error": repr(e)[:200]}
            print(f"# bands={b} failed: {e!r}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
