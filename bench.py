"""Headline benchmarks (run on the real TPU chip by the driver).

Two north-star metrics (BASELINE.md):

1. occupancy query points/sec/chip — dense-grid sweep throughput.  The
   reference re-runs the whole IF-Net conv pyramid for every point chunk
   (reference model/ifnet.py:215-229) on a V100-class GPU.  Here the feature
   pyramid is encoded ONCE and the full dense lattice (res_increase=2 ->
   278 x 208 x 224 = 12.95M query points over the full-scale frustum grid)
   sweeps through IFNet.query_lattice — the separable-resize formulation that
   turns per-point trilinear gathers into banded MXU matmuls
   (sv3d_tpu/ops/lattice.py).

2. sec/scene image->mesh — WARM end-to-end latency of the full pipeline:
   rgb -> UNet depth -> differentiable back-projection/voxelization -> IF-Net
   encode -> dense sweep -> host marching cubes -> .obj.  Compile excluded
   (one warmup run); component times reported alongside.

Timing is synced with device_get of results (block_until_ready alone does not
synchronize through tunneled TPU platforms), with the transfer roundtrip
measured separately and subtracted where it is not part of the work.

Baseline constants are ESTIMATES, not measurements (the reference's V100 was
not available): the reference evaluates chunks of num_points*batch_size =
32,768 points, re-running the full 128-res encoder (~35 GFLOP over the
139x104x112 grid) plus six grid_sample levels per chunk; on a V100 that is
~30-60 ms/chunk => ~0.6-1.1M points/s.  We take 1.0e6 points/s, generous to
the reference; the implied image->mesh baseline at the same 12.95M-point
resolution is ~13 s + marching cubes ~= 15 s.

WALL-CLOCK BUDGET (the round-4 lesson): the driver runs this under a hard
timeout (r4's artifact was rc=124 — killed before any JSON printed, losing
every measurement).  The bench therefore works against an absolute deadline
(SV3D_BENCH_BUDGET seconds total, default 1320 — safely under the observed
~1800 s driver limit) and EMITS A PARSEABLE JSON LINE AS SOON AS THE PRIMARY
METRIC EXISTS, then re-emits an enriched line after every completed section.
The driver parses the LAST valid JSON line in the output (verified against
BENCH_r03.json's tail handling), so each re-emission strictly upgrades the
artifact and a kill at ANY point after the first emission still lands a
parseable result.  Sections run in priority order and are shed when the
remaining budget cannot fit them:

  primary dense sweep (rows=8)  -> emit          [must succeed]
  rows sweep (2, 4)             -> emit each
  reference-scheme baseline     -> emit (gives measured vs_baseline)
  image->mesh scene latency     -> emit
  arbitrary-point kernels       -> emit

Prints JSON lines of the form
{"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...extras};
the last line printed is the richest artifact that fit the budget, with
"sections_completed" recording how far it got.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_POINTS_PER_SEC = 1.0e6  # estimate; see module docstring
BASELINE_SEC_PER_SCENE = 15.0  # estimate; see module docstring
DIMS = (139, 104, 112)
RES_INCREASE = 2
SLAB_ROWS = 8  # the must-succeed primary measurement; the HEADLINE picks the
               # best of rows {1,2,4,8} measured in this run (rows=8 measured
               # fastest 2026-08-17 at 102.7M but dropped to 83.6M on
               # 2026-08-19 while rows=2 held 92.3->91.8M — per-rows timing is
               # chip-window-dependent, so the bench autotunes like a serving
               # deployment would instead of pinning one tiling.  rows=1 —
               # added 2026-08-21 after an interleaved A/B measured it at
               # 119.3-119.9M vs rows=2's 95.6M, +25% — is the serving
               # default (see inference/dense_grid.py)
N_TIMED = 3

# absolute wall-clock deadline (epoch seconds), set by the supervisor and
# inherited across the mid-run crash re-exec (it is absolute, not relative)
_DEADLINE = float(os.environ.get("SV3D_BENCH_DEADLINE", "0")) or None


def _remaining() -> float:
    """Seconds left before the deadline (inf when unconstrained)."""
    if _DEADLINE is None:
        return float("inf")
    return _DEADLINE - time.time()


def _roundtrip_cost():
    trivial = jax.jit(lambda x: x + 1.0)
    _ = trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = trivial(jnp.zeros(())).item()
    return (time.perf_counter() - t0) / 5


def _build_ifnet():
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)
    return model, variables, grid, rng


def bench_points_primary():
    """Dense-sweep throughput at rows=SLAB_ROWS with a pre-encoded pyramid.

    Returns (points_per_sec, measure_fn, n_points, elapsed) — measure_fn
    re-measures at another slab_rows value for the sweep, and elapsed is the
    wall cost of this first (compile-heavy) measurement, used to budget the
    remaining sweep points."""
    from sv3d_tpu.inference.dense_grid import evaluate_on_grid_device
    from sv3d_tpu.models.ifnet import IFNet

    t_start = time.time()
    model, variables, grid, rng = _build_ifnet()
    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    _ = jax.device_get(levels.flats[0][0, 0, :1])  # sync

    res = tuple(d * RES_INCREASE for d in DIMS)
    n_points = res[0] * res[1] * res[2]
    rt = _roundtrip_cost()

    def measure(slab_rows):
        def run():
            out = evaluate_on_grid_device(
                model, variables, levels, DIMS, RES_INCREASE, slab_rows
            )
            return float(jnp.sum(out[0, 0, :8]))  # force execution, scalar pull

        run()  # compile + warmup
        run()
        times = []
        for _ in range(N_TIMED):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0 - rt)
        return n_points / min(times)

    pps = measure(SLAB_ROWS)  # primary: must succeed
    return pps, measure, n_points, time.time() - t_start


def bench_rows_sweep(measure, by_rows, budget_per_row):
    """Measure the remaining slab_rows candidates, stopping when the budget
    cannot fit another point.  r3's 102.7M-builder-vs-84.0M-driver gap turned
    out to be rows=8-specific volatility (rows=2 measured 92.3M on 2026-08-17
    and 91.8M on 2026-08-19 while rows=8 swung 102.7->83.6M), so pinning one
    tiling punishes the headline for a chip-window effect the per-rows sweep
    can see and route around.  The full per-rows dict stays in the artifact:
    if ALL rows shift together it is chip/tunnel state, if ONE moves it is a
    program regression."""
    for rows in (1, 2, 4):
        if _remaining() < budget_per_row:
            print(f"# rows={rows} shed: {_remaining():.0f}s left "
                  f"< {budget_per_row:.0f}s budget", file=sys.stderr)
            break
        try:
            by_rows[rows] = round(measure(rows), 1)
        except Exception as e:  # pragma: no cover - hardware-dependent
            if "crashed or restarted" in str(e):
                raise
            print(f"# rows={rows} sweep skipped: {e!r}", file=sys.stderr)
    return by_rows


def bench_arbitrary_points():
    """ARBITRARY-point (non-lattice) query throughput via the MXU-fused
    Pallas kernel (IFNet.query_fused) — the reference's grid_sample gather
    path analog (reference model/ifnet.py:82-120); XLA gathers measure
    ~0.2M points/s on the same workload.

    Returns (device_resident_pps, banded_pps, host_loop_pps):
      * device-resident — points pre-staged on device, pyramid pre-encoded,
        ONE jitted query call, scalar pull (the kernel's own throughput).
      * host-loop — the evaluate_points API path with its per-call numpy
        staging / result transfer (what a naive caller sees; transfer-bound
        through a tunneled chip)."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.inference.dense_grid import evaluate_points
    from sv3d_tpu.models.ifnet import IFNet

    model, variables, grid, rng = _build_ifnet()
    n = 262144
    pts = np.asarray(
        jax.random.uniform(rng, (n, 3), jnp.float32, -0.45, 0.45)
    )
    use_pallas = jax.default_backend() == "tpu"
    rt = _roundtrip_cost()

    # --- device-resident: stage once, one jit, scalar pull ---
    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    query = jax.jit(
        lambda v, lv, p: jax.nn.sigmoid(
            model.apply(v, lv, p, mesh="local", method=IFNet.query_fused)
        )
        if use_pallas
        else jax.nn.sigmoid(model.apply(v, lv, p, method=IFNet.query))
    )
    pts_dev = jnp.asarray(pts)[None]

    def run_dev():
        return float(jnp.sum(query(variables, levels, pts_dev)[0, :8]))

    run_dev()  # compile + warmup
    run_dev()
    dev_times = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        run_dev()
        dev_times.append(time.perf_counter() - t0 - rt)
    dev_pps = n / min(dev_times)

    # --- 2-D bucketed (slab x band) variant at the time-model-chosen band
    # count (the evaluate_points bands="auto" default; ARCHITECTURE.md §9);
    # guarded — falls back to 0.0 if the banded kernel fails to compile ---
    banded_pps = 0.0
    if use_pallas:
        try:
            from sv3d_tpu.ops.pallas.cost import choose_bands

            bsel = choose_bands(IFNetConfig.for_net_res(128), DIMS, n=n) or 8
            print(f"# banded bench: bands={bsel}", file=sys.stderr)
            query_b = jax.jit(
                lambda v, lv, p: jax.nn.sigmoid(
                    model.apply(
                        v, lv, p, mesh="local", bands=bsel,
                        method=IFNet.query_fused,
                    )
                )
            )

            def run_banded():
                return float(jnp.sum(query_b(variables, levels, pts_dev)[0, :8]))

            run_banded()
            run_banded()
            b_times = []
            for _ in range(N_TIMED):
                t0 = time.perf_counter()
                run_banded()
                b_times.append(time.perf_counter() - t0 - rt)
            banded_pps = n / min(b_times)
        except Exception as e:  # pragma: no cover - hardware-dependent
            print(f"# banded arbitrary-point bench skipped: {e!r}", file=sys.stderr)

    # --- host-loop API path (one tile: a single staging round-trip) ---
    kw = dict(tile_points=n, use_pallas=use_pallas)
    evaluate_points(model, variables, grid, pts, **kw)  # warm
    times = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        evaluate_points(model, variables, grid, pts, **kw)
        times.append(time.perf_counter() - t0 - rt)
    return dev_pps, banded_pps, n / min(times)


def bench_reference_scheme():
    """MEASURED baseline on the SAME chip: the reference's dense-evaluation
    scheme (reference model/ifnet.py:215-229) — the full conv pyramid is
    re-encoded for EVERY chunk of num_points*batch_size = 32,768 query
    points, queried with exact f32 gathers (the torch grid_sample analog).
    This turns the primary metric's vs_baseline into an apples-to-apples
    number instead of a V100 FLOP estimate."""
    model, variables, grid, rng = _build_ifnet()

    chunk = 32768  # reference num_points=2048 * batch_size=16
    n_chunks = 4   # enough to amortize; each chunk re-runs the encoder
    pts = jax.random.uniform(rng, (n_chunks, 1, chunk, 3), jnp.float32, -0.45, 0.45)

    # encode + gather-query per chunk — IFNet.__call__, exactly the
    # reference's network(x, pi) loop body
    step = jax.jit(
        lambda v, g, p: jax.nn.sigmoid(model.apply(v, g, p, train=False))
    )

    def run():
        acc = 0.0
        for i in range(n_chunks):
            acc += float(jnp.sum(step(variables, grid, pts[i])[0, :8]))
        return acc

    rt = _roundtrip_cost()
    run()  # compile + warmup
    run()
    times = []
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0 - n_chunks * rt)
    return n_chunks * chunk / min(times)


def bench_scene(slab_rows=SLAB_ROWS):
    """Warm image->mesh latency of the full SceneNet pipeline (one scene).

    Uses the trained end-to-end checkpoint (runs/quality_e2e) and the overfit
    fixture image when available, so the occupancy field — and hence the
    marching-cubes load — is the realistic thin-surface one; falls back to
    random init/input otherwise."""
    from pathlib import Path

    from sv3d_tpu.config import Config
    from sv3d_tpu.inference.dense_grid import evaluate_on_grid_device
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.models.scene_net import SceneNet
    from sv3d_tpu.utils.visualize import visualize_sdf_u8
    from __graft_entry__ import _INTRINSICS
    from sv3d_tpu.geometry.frustum import FrustumGrid

    cfg = Config(seed=0, num_points=8, batch_size=1, net_res=128)
    frustum = FrustumGrid.create(_INTRINSICS, voxel_size=0.05)
    model = SceneNet(cfg, _INTRINSICS, frustum)

    rng = jax.random.PRNGKey(0)
    root = Path(os.path.dirname(os.path.abspath(__file__)))
    rgb_path = root / ".fixture_data" / "raw" / "overfit" / "00000" / "rgb.png"
    if rgb_path.exists():
        from sv3d_tpu.io.image import load_rgb, normalize_rgb

        rgb = jnp.asarray(
            np.moveaxis(normalize_rgb(load_rgb(rgb_path)), 0, -1)[None]
        )
    else:
        rgb = jax.random.uniform(rng, (1, 240, 320, 3), jnp.float32, -1.0, 1.0)
    depth_t = jnp.full((1, 240, 320), 2.0, jnp.float32)
    pts = jnp.zeros((1, 16, 3), jnp.float32)
    variables = model.init(rng, rgb, depth_t, pts, train=False)

    # any full-scale SceneNet checkpoint keeps the occupancy field — and
    # hence the marching-cubes load — realistic (random init meshes noise,
    # tripling the MC time); prefer the overfit e2e run, else a scaling arm
    candidates = [root / "runs" / "quality_e2e" / "checkpoints" / "last"]
    candidates += sorted(
        root.glob("runs/scaling_*/checkpoints/last"), reverse=True
    )
    candidates += [root / "runs" / "quality_multiscene" / "checkpoints" / "last"]
    ckpt = next((c for c in candidates if c.exists()), None)
    if ckpt is not None:
        from sv3d_tpu.training.checkpoint import _restore_like, restore_tree

        print(f"# bench_scene: weights from {ckpt}", file=sys.stderr)
        tree = restore_tree(ckpt)
        variables = {
            "params": _restore_like(variables["params"], tree["params"]),
            "batch_stats": _restore_like(
                variables["batch_stats"], tree["batch_stats"]
            ),
        }

    @jax.jit
    def image_to_grid(variables, rgb):
        depth = model.apply(variables, rgb, train=False, method=SceneNet.predict_depth)
        pc = model.apply(variables, depth, method=SceneNet.project_depth)
        return model.apply(variables, pc, method=lambda m, p: m.project(p))

    ifnet = IFNet(cfg.ifnet())
    ifnet_vars = {
        "params": variables["params"]["ifnet"],
        "batch_stats": variables["batch_stats"].get("ifnet", {}),
    }
    encode = jax.jit(
        lambda v, g: IFNet(cfg.ifnet()).apply(v, g, train=False, method=IFNet.encode)
    )
    res0 = DIMS[0] * RES_INCREASE
    out_path = "/tmp/bench_scene_mesh.obj"

    def run():
        t0 = time.perf_counter()
        vox = image_to_grid(variables, rgb)
        levels = encode(ifnet_vars, vox)
        value = evaluate_on_grid_device(
            ifnet, ifnet_vars, levels, DIMS, RES_INCREASE, slab_rows
        )
        # device->host pull (part of the work): u8 fixed-point quarters the
        # 52 MB grid — the pull dominates warm latency, and the serving-path
        # default (implicit_to_mesh) is u8 since the measured A/B
        # (f32 1567 / f16 1372 / u8 564 ms sweep+pull; see evaluate_on_grid)
        value_u8 = np.asarray((value[:res0] * 255.0 + 0.5).astype(jnp.uint8))
        t1 = time.perf_counter()
        # native u8 marching cubes (the implicit_to_mesh serving path): same
        # mesh to float rounding, no f32 cast / 1-v full-grid temporaries
        visualize_sdf_u8(value_u8, out_path, level=0.5)
        t2 = time.perf_counter()
        return t1 - t0, t2 - t1

    run()  # compile + warmup
    run()
    totals, devs, mcs = [], [], []
    for _ in range(N_TIMED):
        d, m = run()
        devs.append(d)
        mcs.append(m)
        totals.append(d + m)
    i = int(np.argmin(totals))
    return totals[i], devs[i], mcs[i]


def _guarded(fn, fallback, errors):
    """Run a secondary bench section; degrade to `fallback` on failure so one
    broken section does not zero the whole artifact.  Worker-crash errors
    re-raise: the child-level re-exec (warm compile cache) fixes those."""
    try:
        return fn()
    except Exception as e:  # pragma: no cover - hardware-dependent
        if "crashed or restarted" in str(e):
            raise
        errors.append(f"{fn.__name__}: {e!r}"[:300])
        print(f"# {fn.__name__} failed: {e!r}", file=sys.stderr)
        return fallback


# conservative worst-case wall costs (s) per section on a COLD compile cache,
# from builder-session measurements on the tunneled chip; a section only runs
# when this much budget remains, so a slow chip window degrades the artifact
# gracefully instead of losing it
_SECTION_COST = {
    "rows_point": 60,        # one extra slab_rows measurement (compile + 5 runs)
    "reference_scheme": 150,  # encoder re-compile + 6 runs of 4 chunks
    "scene": 240,             # scene-net compile + encode + sweep + 5 runs + MC
    "arbitrary": 300,         # fused + banded kernel compiles + host loop
}


def main():
    errors = []
    state = {
        "value": 0.0,
        "best_rows": SLAB_ROWS,
        "by_rows": {},
        "ref_pps": 0.0,
        "scene": (0.0, 0.0, 0.0),
        "arb": (0.0, 0.0, 0.0),
        "sections": [],
    }

    def emit():
        """Print the current artifact as one JSON line (the driver keeps the
        LAST valid line, so every emission strictly upgrades the artifact)."""
        pps = state["value"]
        ref_pps = state["ref_pps"]
        scene_s, device_s, mc_s = state["scene"]
        arb_dev_pps, arb_banded_pps, arb_host_pps = state["arb"]
        n_sweep = (
            (DIMS[0] * RES_INCREASE)
            * (DIMS[1] * RES_INCREASE)
            * (DIMS[2] * RES_INCREASE)
        )
        # measured same-chip baseline for sec/scene: the reference scheme over
        # the same 12.95M-point sweep, plus this run's own marching-cubes time
        ref_scene_s = n_sweep / ref_pps + mc_s if ref_pps > 0 else 0.0
        payload = {}
        if errors:
            payload["section_errors"] = errors
        print(
            json.dumps(
                {
                    **payload,
                    "metric": "occupancy query points/sec/chip (dense 278x208x224 sweep, IF-Net-128)",
                    "value": round(pps, 1),
                    "unit": "points/s",
                    "vs_baseline": round(pps / ref_pps, 3) if ref_pps > 0 else 0.0,
                    "reference_scheme_points_per_sec": round(ref_pps, 1),
                    "vs_v100_estimate": round(pps / BASELINE_POINTS_PER_SEC, 3),
                    "slab_rows_used": state["best_rows"],
                    "points_per_sec_by_slab_rows": {
                        str(k): v for k, v in sorted(state["by_rows"].items())
                    },
                    "sec_per_scene_image_to_mesh": round(scene_s, 3),
                    "sec_per_scene_device": round(device_s, 3),
                    "sec_per_scene_marching_cubes": round(mc_s, 3),
                    "sec_per_scene_vs_baseline": (
                        round(ref_scene_s / scene_s, 3) if scene_s > 0 else 0.0
                    ),
                    "reference_scheme_sec_per_scene": round(ref_scene_s, 3),
                    "arbitrary_points_per_sec": round(arb_dev_pps, 1),
                    "arbitrary_points_per_sec_banded": round(arb_banded_pps, 1),
                    "arbitrary_points_per_sec_host_loop": round(arb_host_pps, 1),
                    "sections_completed": list(state["sections"]),
                    "budget_remaining_s": (
                        round(_remaining(), 1) if _DEADLINE else None
                    ),
                    "note": "vs_baseline = measured on THIS chip vs the reference's own per-chunk re-encoding scheme (model/ifnet.py:215-229) run on the same chip; vs_v100_estimate keeps the r1 FLOP-argument context (1.0M pts/s / 15 s per scene on V100)",
                },
            ),
            flush=True,
        )

    # --- primary metric: must succeed; emit the moment it exists ---
    pps, measure, n_points, primary_cost = bench_points_primary()
    state["value"] = pps
    state["by_rows"] = {SLAB_ROWS: round(pps, 1)}
    state["sections"].append("points_primary")
    emit()

    # --- rows sweep: autotune the headline; compile dominates the first
    # measurement, so budget each further point at half the primary's cost
    # (floored at the static estimate) ---
    per_row_budget = max(_SECTION_COST["rows_point"], primary_cost * 0.5)
    bench_rows_sweep(measure, state["by_rows"], per_row_budget)
    state["best_rows"] = max(state["by_rows"], key=state["by_rows"].get)
    state["value"] = state["by_rows"][state["best_rows"]]
    state["sections"].append("rows_sweep")
    emit()

    # --- secondary sections, priority order, each gated on remaining budget
    # and emitted as soon as it lands ---
    if _remaining() > _SECTION_COST["reference_scheme"]:
        state["ref_pps"] = _guarded(bench_reference_scheme, 0.0, errors)
        state["sections"].append("reference_scheme")
        emit()
    else:
        print(f"# reference_scheme shed ({_remaining():.0f}s left)", file=sys.stderr)

    if _remaining() > _SECTION_COST["scene"]:
        best_rows = state["best_rows"]

        def bench_scene_tuned():
            return bench_scene(best_rows)

        bench_scene_tuned.__name__ = "bench_scene"  # keep the error label stable
        state["scene"] = _guarded(bench_scene_tuned, (0.0, 0.0, 0.0), errors)
        state["sections"].append("scene")
        emit()
    else:
        print(f"# scene shed ({_remaining():.0f}s left)", file=sys.stderr)

    if _remaining() > _SECTION_COST["arbitrary"]:
        state["arb"] = _guarded(bench_arbitrary_points, (0.0, 0.0, 0.0), errors)
        state["sections"].append("arbitrary")
        emit()
    else:
        print(f"# arbitrary shed ({_remaining():.0f}s left)", file=sys.stderr)


def _supervise():
    """Run the measurement in a CHILD process, retrying on every observed
    tunnel failure mode, and ALWAYS print at least one parseable JSON line.

    Observed failure modes of the tunneled TPU worker (axon):
      * mid-run crash: "... crashed or restarted" on a fresh Mosaic kernel's
        first execution (~50% on cold kernels; never once the persistent
        compile cache under .jax_cache is warm — entries are written at
        compile time, BEFORE the crash, so a re-run skips the crash window);
      * init-time failure: "Unable to initialize backend 'axon':
        UNAVAILABLE: TPU backend setup/compile error" (killed round 2's
        BENCH — the old retry only matched mid-run crashes);
      * init-time HANG: jax.devices() blocks for minutes with no exception;
      * the DRIVER's own wall-clock limit killing the whole process tree
        (killed round 4's BENCH at rc=124 — the r4 supervisor hardened every
        failure mode except this one).

    Against the last mode the only defense is streaming: the child's stdout
    is forwarded LINE BY LINE as it is produced, so the incremental JSON
    emissions (see main()) are already on the driver's captured output
    whenever the kill arrives.  Everything runs against one absolute
    deadline: child timeouts, retry counts and backoff sleeps are all capped
    by the remaining budget (SV3D_BENCH_BUDGET seconds total, default 1320 —
    r4 was killed at ~1800 s wall; 1320 leaves margin for interpreter
    startup and the driver's own overhead)."""
    import subprocess
    import threading

    budget = float(os.environ.get("SV3D_BENCH_BUDGET", "1320"))
    deadline = time.time() + budget
    attempts = int(os.environ.get("SV3D_BENCH_ATTEMPTS", "4"))
    # a fresh attempt needs at least the primary section (cold compile worst
    # case ~200 s) plus margin; below this, stop retrying
    min_attempt_s = float(os.environ.get("SV3D_BENCH_MIN_ATTEMPT", "240"))
    sleeps = [
        float(s)
        for s in os.environ.get("SV3D_BENCH_SLEEPS", "15,60,120").split(",")
    ]
    env = dict(
        os.environ, SV3D_BENCH_CHILD="1", SV3D_BENCH_DEADLINE=f"{deadline:.3f}"
    )
    last_err = "unknown"
    got_json = False
    for attempt in range(attempts):
        remaining = deadline - time.time()
        if remaining < min_attempt_s and attempt > 0:
            last_err += f"; budget exhausted ({remaining:.0f}s left)"
            break
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
        )
        # watchdog: the child's OWN budget logic sheds sections to finish in
        # time, but a hung backend produces no output at all — kill it a
        # grace period past the deadline so the read loop below can't block
        # forever (the r4 failure mode, inverted: better to stop measuring
        # than to lose what was already streamed)
        timed_out = threading.Event()

        def _kill():
            timed_out.set()
            proc.kill()

        grace = min(15.0, max(budget * 0.05, 1.0))
        watchdog = threading.Timer(max(deadline - time.time(), 0.5) + grace, _kill)
        watchdog.daemon = True
        watchdog.start()
        tail = ""
        try:
            # stream stdout through line-by-line: every JSON emission is
            # durable the instant the child prints it, even if THIS process
            # is killed later
            for raw in proc.stdout:
                line = raw.decode("utf-8", "replace")
                sys.stdout.write(line)
                sys.stdout.flush()
                line = line.strip()
                if line:
                    tail = line
                if line.startswith("{"):
                    try:
                        json.loads(line)
                        got_json = True
                    except ValueError:
                        pass
            rc = proc.wait()
        finally:
            watchdog.cancel()
        if timed_out.is_set():
            last_err = f"child timed out ({budget:.0f}s budget; backend hang?)"
        elif rc == 0 and got_json:
            return 0
        else:
            last_err = f"child rc={rc}, tail={tail!r}"
        sys.stderr.write(
            f"bench: attempt {attempt + 1}/{attempts} failed: {last_err}\n"
        )
        sys.stderr.flush()
        if attempt < attempts - 1:
            # backoff, clipped so sleeping never eats the last viable attempt
            nap = min(
                sleeps[min(attempt, len(sleeps) - 1)],
                max(deadline - time.time() - min_attempt_s, 0),
            )
            time.sleep(nap)
    if got_json:
        # a partial artifact already streamed through — that IS the result
        return 0
    print(
        json.dumps(
            {
                "metric": "occupancy query points/sec/chip (dense 278x208x224 sweep, IF-Net-128)",
                "value": 0.0,
                "unit": "points/s",
                "vs_baseline": 0.0,
                "error": f"all bench attempts failed; last: {last_err}",
            }
        ),
        flush=True,
    )
    return 1


def _child_main():
    """One measurement attempt (runs inside the supervised child).  A
    mid-run worker crash is retried by re-exec — the compile cache is warm
    by then, which historically always succeeds — but only while enough
    budget remains for the primary section."""
    mode = os.environ.get("SV3D_BENCH_TEST_MODE")  # supervisor test hook
    if mode == "hang":
        time.sleep(3600)
    elif mode == "fail":
        sys.exit(3)
    elif mode == "ok":
        print(json.dumps({"metric": "test", "value": 1.0, "unit": "x", "vs_baseline": 1.0}))
        return
    elif mode == "partial_then_hang":
        print(
            json.dumps(
                {"metric": "test", "value": 2.0, "unit": "x", "vs_baseline": 1.0}
            ),
            flush=True,
        )
        time.sleep(3600)
    try:
        main()
    except Exception as e:  # jax.errors.JaxRuntimeError, unstable worker
        retries = int(os.environ.get("SV3D_BENCH_RETRY", "0"))
        if (
            "crashed or restarted" in str(e)
            and retries < 2
            and _remaining() > 180
        ):
            sys.stderr.write(
                f"bench: TPU worker crash (retry {retries + 1}/2), "
                "re-exec with warm compile cache\n"
            )
            os.environ["SV3D_BENCH_RETRY"] = str(retries + 1)
            sys.stderr.flush()
            sys.stdout.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise


if __name__ == "__main__":
    if os.environ.get("SV3D_BENCH_CHILD"):
        _child_main()
    else:
        sys.exit(_supervise())
