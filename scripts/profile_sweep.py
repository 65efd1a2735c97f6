"""Decompose the dense-sweep cost on the real TPU (VERDICT r1 item 5).

The full 278x208x224 sweep measures ~16.5M points/s (~13% MFU at
~1.6 MFLOP/point).  This script times stage-truncated variants of the sweep
(IFNet.query_lattice stop_stage) to localize the cost:

  resizes      — displaced separable resizes + concat only (no MLP)
  fc0          — resizes + the K=2583 first layer (no tail)
  full         — whole sweep, XLA einsum MLP
  full_pallas  — whole sweep, fused Pallas point-MLP kernel

at configurable slab widths.  Everything reuses the exact query_lattice code
path, so the compiled programs differ from production only by truncation.

Timing follows bench.py: scalar pull to sync (block_until_ready does not
synchronize through tunneled TPU platforms), roundtrip subtracted.  Through
the tunnel each new program's compile is slow — use --stages/--rows to run
one variant per invocation; the persistent cache accumulates.

Usage: python scripts/profile_sweep.py --stages full --rows 2
       python scripts/profile_sweep.py --cpu --dims 17,13,14   # smoke
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--res_increase", type=int, default=2)
    p.add_argument("--net_res", type=int, default=128)
    p.add_argument("--timed", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--dims", default="139,104,112")
    p.add_argument("--stages", default="resizes,fc0,full,full_pallas",
                   help="comma list; run few per invocation to bound slow "
                   "tunnel compiles")
    p.add_argument("--rows", default="2,4")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    dims = tuple(int(x) for x in args.dims.split(","))
    cfg = IFNetConfig.for_net_res(args.net_res)
    model = IFNet(cfg)
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *dims, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)
    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    _ = jax.device_get(levels.flats[0][0, 0, :1])

    r = tuple(d * args.res_increase for d in dims)
    n_points = r[0] * r[1] * r[2]

    trivial = jax.jit(lambda x: x + 1.0)
    _ = trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = trivial(jnp.zeros(())).item()
    rt = (time.perf_counter() - t0) / 5

    def timed(fn, *a):
        fn(*a)  # compile + warm
        fn(*a)
        ts = []
        for _ in range(args.timed):
            t0 = time.perf_counter()
            fn(*a)
            ts.append(time.perf_counter() - t0 - rt)
        return min(ts)

    def sweep(stage, slab_rows, use_pallas_mlp):
        n_slabs = -(-r[0] // slab_rows)
        stop = None if stage.startswith("full") else stage

        fn = jax.jit(
            lambda v, lv: jax.lax.map(
                lambda off: model.apply(
                    v, lv, dims, args.res_increase, slab_rows, off,
                    use_pallas_mlp=use_pallas_mlp, stop_stage=stop,
                    method=IFNet.query_lattice,
                )[0, 0, 0, :8],
                jnp.arange(n_slabs, dtype=jnp.int32) * slab_rows,
            )
        )

        def run(v, lv):
            return float(jnp.sum(fn(v, lv)))

        return timed(run, variables, levels)

    wanted = args.stages.split(",")
    results = {}
    for slab_rows in (int(x) for x in args.rows.split(",")):
        for stage, pallas in (("resizes", False), ("fc0", False),
                              ("full", False), ("full_pallas", True)):
            if stage not in wanted:
                continue
            key = f"{stage}_rows{slab_rows}"
            try:
                t = sweep(stage, slab_rows, pallas)
                results[key] = {
                    "seconds": round(t, 4),
                    "mpts_per_sec": round(n_points / t / 1e6, 2),
                }
                print(key, results[key], flush=True)
            except Exception as e:  # keep probing other configs
                results[key] = {"error": f"{type(e).__name__}: {e}"[:200]}
                print(key, "ERROR", str(e)[:200], flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
