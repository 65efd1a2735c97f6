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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
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
               # best of rows {2,4,8} measured in this run (rows=8 measured
               # fastest 2026-08-17 at 102.7M but dropped to 83.6M on
               # 2026-08-19 while rows=2 held 92.3->91.8M — per-rows timing is
               # chip-window-dependent, so the bench autotunes like a serving
               # deployment would instead of pinning one tiling)
N_TIMED = 3


def _roundtrip_cost():
    trivial = jax.jit(lambda x: x + 1.0)
    _ = trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        _ = trivial(jnp.zeros(())).item()
    return (time.perf_counter() - t0) / 5


def bench_points():
    """Dense-sweep throughput with a pre-encoded pyramid.

    Returns (best points_per_sec, best slab_rows, {slab_rows: points_per_sec}).
    All of rows {8,2,4} are measured (rows=SLAB_ROWS first — that one must
    succeed) and the HEADLINE is the best row: r3's 102.7M-builder-vs-
    84.0M-driver gap turned out to be rows=8-specific volatility (rows=2
    measured 92.3M on 2026-08-17 and 91.8M on 2026-08-19 while rows=8 swung
    102.7->83.6M), so pinning one tiling punishes the headline for a
    chip-window effect the per-rows sweep can see and route around.  The full
    per-rows dict stays in the artifact: if ALL rows shift together it is
    chip/tunnel state, if ONE moves it is a program regression."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.inference.dense_grid import evaluate_on_grid_device
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)

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
    by_rows = {SLAB_ROWS: round(pps, 1)}
    for rows in (2, 4):
        try:
            by_rows[rows] = round(measure(rows), 1)
        except Exception as e:  # pragma: no cover - hardware-dependent
            if "crashed or restarted" in str(e):
                raise
            print(f"# rows={rows} sweep skipped: {e!r}", file=sys.stderr)
    best_rows = max(by_rows, key=by_rows.get)
    return by_rows[best_rows], best_rows, by_rows


def bench_arbitrary_points():
    """ARBITRARY-point (non-lattice) query throughput via the MXU-fused
    Pallas kernel (IFNet.query_fused) — the reference's grid_sample gather
    path analog (reference model/ifnet.py:82-120); XLA gathers measure
    ~0.2M points/s on the same workload.

    Returns (device_resident_pps, host_loop_pps):
      * device-resident — points pre-staged on device, pyramid pre-encoded,
        ONE jitted query call, scalar pull (the kernel's own throughput).
      * host-loop — the evaluate_points API path with its per-call numpy
        staging / result transfer (what a naive caller sees; transfer-bound
        through a tunneled chip)."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.inference.dense_grid import evaluate_points
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)
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
    This turns bench_points' vs_baseline into an apples-to-apples number
    instead of a V100 FLOP estimate."""
    from sv3d_tpu.config import IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet

    model = IFNet(IFNetConfig.for_net_res(128))
    rng = jax.random.PRNGKey(0)
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(rng, grid, jnp.zeros((1, 8, 3)), train=False)

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

    ckpt = root / "runs" / "quality_e2e" / "checkpoints" / "last"
    if ckpt.exists():
        from sv3d_tpu.training.checkpoint import _restore_like, restore_tree

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


def main():
    errors = []
    pps, best_rows, pps_by_rows = bench_points()  # primary metric: must succeed
    ref_pps = _guarded(bench_reference_scheme, 0.0, errors)
    arb_dev_pps, arb_banded_pps, arb_host_pps = _guarded(
        bench_arbitrary_points, (0.0, 0.0, 0.0), errors
    )

    def bench_scene_tuned():
        return bench_scene(best_rows)

    bench_scene_tuned.__name__ = "bench_scene"  # keep the error label stable
    scene_s, device_s, mc_s = _guarded(bench_scene_tuned, (0.0, 0.0, 0.0), errors)
    # measured same-chip baseline for sec/scene: the reference scheme over the
    # same 12.95M-point sweep, plus this run's own marching-cubes time
    n_sweep = (DIMS[0] * RES_INCREASE) * (DIMS[1] * RES_INCREASE) * (DIMS[2] * RES_INCREASE)
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
                "slab_rows_used": best_rows,
                "points_per_sec_by_slab_rows": {
                    str(k): v for k, v in sorted(pps_by_rows.items())
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
                "note": "vs_baseline = measured on THIS chip vs the reference's own per-chunk re-encoding scheme (model/ifnet.py:215-229) run on the same chip; vs_v100_estimate keeps the r1 FLOP-argument context (1.0M pts/s / 15 s per scene on V100)",
            }
        )
    )


def _supervise():
    """Run the measurement in a CHILD process, retrying on every observed
    tunnel failure mode, and ALWAYS print one parseable JSON line.

    Observed failure modes of the tunneled TPU worker (axon):
      * mid-run crash: "... crashed or restarted" on a fresh Mosaic kernel's
        first execution (~50% on cold kernels; never once the persistent
        compile cache under .jax_cache is warm — entries are written at
        compile time, BEFORE the crash, so a re-run skips the crash window);
      * init-time failure: "Unable to initialize backend 'axon':
        UNAVAILABLE: TPU backend setup/compile error" (killed round 2's
        BENCH — the old retry only matched mid-run crashes);
      * init-time HANG: jax.devices() blocks for minutes with no exception.

    A subprocess with a wall-clock timeout covers all three.  Retries sleep
    with backoff (the worker has been observed to recover after minutes);
    the compile cache accumulates across attempts so each retry gets
    further.  If every attempt fails, a JSON line with an "error" field is
    emitted so the driver still gets parseable output.
    """
    import subprocess

    attempts = int(os.environ.get("SV3D_BENCH_ATTEMPTS", "4"))
    timeout_s = float(os.environ.get("SV3D_BENCH_TIMEOUT", "1800"))
    sleeps = [
        float(s)
        for s in os.environ.get("SV3D_BENCH_SLEEPS", "30,120,300").split(",")
    ]
    env = dict(os.environ, SV3D_BENCH_CHILD="1")
    last_err = "unknown"
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=sys.stderr,
                timeout=timeout_s,
            )
            out = proc.stdout.decode("utf-8", "replace")
            # forward the child's JSON line if it produced one
            json_line = None
            for line in out.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        json.loads(line)
                        json_line = line
                    except ValueError:
                        pass
            if proc.returncode == 0 and json_line is not None:
                print(json_line)
                return 0
            last_err = (
                f"child rc={proc.returncode}, "
                f"tail={out.strip().splitlines()[-1] if out.strip() else ''!r}"
            )
        except subprocess.TimeoutExpired:
            last_err = f"child timed out after {timeout_s:.0f}s (backend hang?)"
        sys.stderr.write(
            f"bench: attempt {attempt + 1}/{attempts} failed: {last_err}\n"
        )
        sys.stderr.flush()
        if attempt < attempts - 1:
            time.sleep(sleeps[min(attempt, len(sleeps) - 1)])
    print(
        json.dumps(
            {
                "metric": "occupancy query points/sec/chip (dense 278x208x224 sweep, IF-Net-128)",
                "value": 0.0,
                "unit": "points/s",
                "vs_baseline": 0.0,
                "error": f"all {attempts} bench attempts failed; last: {last_err}",
            }
        )
    )
    return 1


def _child_main():
    """One measurement attempt (runs inside the supervised child).  A
    mid-run worker crash is retried once by re-exec — the compile cache is
    warm by then, which historically always succeeds."""
    mode = os.environ.get("SV3D_BENCH_TEST_MODE")  # supervisor test hook
    if mode == "hang":
        time.sleep(3600)
    elif mode == "fail":
        sys.exit(3)
    elif mode == "ok":
        print(json.dumps({"metric": "test", "value": 1.0, "unit": "x", "vs_baseline": 1.0}))
        return
    try:
        main()
    except Exception as e:  # jax.errors.JaxRuntimeError, unstable worker
        retries = int(os.environ.get("SV3D_BENCH_RETRY", "0"))
        if "crashed or restarted" in str(e) and retries < 2:
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
