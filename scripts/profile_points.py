"""Decompose the device-resident arbitrary-point fused-query cost on TPU.

bench.py measures ~2.5M points/s for 262k arbitrary points through
IFNet.query_fused (vs 0.2M for XLA gathers, but far below the dense sweep's
87M lattice points/s).  This script captures a jax.profiler trace of the
query and groups device events by op, separating:

  bucket   — bucket_queries (counting sort of points into axis-0 slabs)
  level_i  — the per-pyramid-level interpolation kernels (level_features)
  mlp      — the fc0 + decoder einsums on the bucket-padded layout
  other    — layout/copy/transfer ops

Usage: python scripts/profile_points.py [--n 262144] [--cpu]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax


def parse_trace(tracedir: str) -> dict:
    """Sum device-event durations (us) by op-name bucket."""
    paths = glob.glob(
        os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        raise FileNotFoundError(f"no trace under {tracedir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device pids: process names containing "TPU" / "/device:"
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                dev_pids.add(e["pid"])
    by_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        by_op[e.get("name", "?")] += e.get("dur", 0.0)
    return dict(by_op)


def bucket_name(op: str) -> str:
    lo = op.lower()
    if "bucket" in lo or "sort" in lo or "cumsum" in lo or "scatter" in lo:
        return "bucket/sort"
    if "level_features" in lo or "custom-call" in lo or "mosaic" in lo:
        return "level kernels (pallas)"
    if "dot" in lo or "einsum" in lo or "fusion" in lo and "dot" in lo:
        return "mlp dots"
    if "copy" in lo or "transpose" in lo or "reshape" in lo or "concat" in lo:
        return "layout/copy"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=262144)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--bands", type=int, default=None,
                   help="band_cols for the 2-D bucketed kernel (e.g. 8)")
    p.add_argument("--tracedir", default="/tmp/prof_points")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    DIMS = (139, 104, 112)
    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = jax.jit(
        lambda k: model.init(k, grid, jnp.zeros((1, 8, 3)), train=False)
    )(rng)
    pts = jax.random.uniform(rng, (1, args.n, 3), jnp.float32, -0.45, 0.45)

    encode = jax.jit(
        lambda v, g: model.apply(v, g, train=False, method=IFNet.encode)
    )
    levels = encode(variables, grid)
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        apply = lambda v, lv, p: model.apply(
            v, lv, p, mesh="local", bands=args.bands, method=IFNet.query_fused
        )
    else:
        apply = lambda v, lv, p: model.apply(v, lv, p, method=IFNet.query)
    query = jax.jit(lambda v, lv, p: jax.nn.sigmoid(apply(v, lv, p)))

    def run():
        return float(jnp.sum(query(variables, levels, pts)[0, :8]))

    run(); run()  # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"wall {wall*1e3:.1f} ms -> {args.n/wall/1e6:.2f}M pts/s")

    with jax.profiler.trace(args.tracedir):
        for _ in range(3):
            run()

    by_op = parse_trace(args.tracedir)
    total = sum(by_op.values())
    groups = defaultdict(float)
    for op, us in by_op.items():
        groups[bucket_name(op)] += us
    print(f"device total {total/3/1e3:.2f} ms/iter")
    for g, us in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {g:28s} {us/3/1e3:8.2f} ms/iter  {100*us/total:5.1f}%")
    print("top ops:")
    for op, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:18]:
        print(f"  {us/3/1e3:8.2f} ms/iter  {op[:100]}")


if __name__ == "__main__":
    main()
