"""Measure TPU train-step component costs to direct kernel work.

Times (warm, synced via scalar pulls with tunnel roundtrip subtracted):
  * scatter_voxels (XLA trilinear scatter-add)       — voxelization hot op
  * voxelize (scatter + learnable Gaussian smoothing)
  * IFNet.query gather path at training point counts — grid_sample hot op
  * full SceneNet train step (fwd+bwd+adam)

Run on the real chip: python scripts/measure_step.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

B = 8
N_POINTS = 4096  # 2 * num_points(2048), the reference's training load
DIMS = (139, 104, 112)


def timeit(fn, *args, n=5):
    fn(*args)  # compile
    fn(*args)
    # roundtrip cost
    trivial = jax.jit(lambda x: x + 1.0)
    trivial(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(5):
        trivial(jnp.zeros(())).item()
    rt = (time.perf_counter() - t0) / 5
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        times.append(time.perf_counter() - t0 - rt)
    return min(times)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--set", choices=["base", "fused", "serving", "all"],
                    default="base",
                    help="which configs to measure (fused kernels cost tens "
                    "of seconds of Mosaic compile each on a cold cache; "
                    "serving = dense-sweep transfer-dtype A/B + mesh write)")
    ap.add_argument("--skip_ops", action="store_true",
                    help="skip the per-op section, only time train steps")
    args, _ = ap.parse_known_args()

    from sv3d_tpu.config import Config, IFNetConfig
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.ops.voxelize import gaussian_kernels_1d, scatter_voxels, voxelize

    rng = jax.random.PRNGKey(0)
    pts_vox = jax.random.uniform(rng, (B, 76800, 3), jnp.float32, -0.45, 0.45)
    pts_q = jax.random.uniform(rng, (B, N_POINTS, 3), jnp.float32, -0.45, 0.45)
    sigma = jnp.asarray([1.5, 1.5, 1.5])

    if args.set == "serving":
        return _serving(rng)
    if args.skip_ops:
        return _finish(args, rng, pts_q)

    scatter = jax.jit(lambda p: scatter_voxels(p, DIMS))
    f_scatter = lambda p: scatter(p)[0, 0, 0, 0].item()
    print(f"scatter_voxels  (B={B}, 76800 pts): {timeit(f_scatter, pts_vox)*1e3:8.2f} ms")

    from sv3d_tpu.ops.pallas.voxelize import scatter_voxels_pallas

    scp = jax.jit(lambda p: scatter_voxels_pallas(p, DIMS))
    f_scp = lambda p: scp(p)[0, 0, 0, 0].item()
    print(f"scatter pallas  (B={B}, 76800 pts): {timeit(f_scp, pts_vox)*1e3:8.2f} ms")
    g_scp = jax.jit(jax.grad(lambda p: jnp.sum(scatter_voxels_pallas(p, DIMS) ** 2)))
    f_gscp = lambda p: g_scp(p)[0, 0, 0].item()
    print(f"scatter pallas grad (B={B}):        {timeit(f_gscp, pts_vox)*1e3:8.2f} ms")

    vox_full = jax.jit(lambda p, s: voxelize(p, DIMS, s, (3, 3, 3)))
    f_vox = lambda p, s: vox_full(p, s)[0, 0, 0, 0, 0].item()
    print(f"voxelize full   (B={B}, 76800 pts): {timeit(f_vox, pts_vox, sigma)*1e3:8.2f} ms")

    # scatter backward (the training path differentiates through points)
    g_scatter = jax.jit(jax.grad(lambda p: jnp.sum(scatter_voxels(p, DIMS) ** 2)))
    f_gs = lambda p: g_scatter(p)[0, 0, 0].item()
    print(f"scatter grad    (B={B}, 76800 pts): {timeit(f_gs, pts_vox)*1e3:8.2f} ms")

    # IFNet gather-path query at training size
    model = IFNet(IFNetConfig.for_net_res(128))
    grid = (jax.random.uniform(rng, (B, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), grid[:1], jnp.zeros((1, 8, 3)), train=False)

    encode = jax.jit(lambda v, g: model.apply(v, g, train=False, method=IFNet.encode))
    levels = encode(variables, grid)
    jax.device_get(levels.flats[0][0, 0, :1])

    query = jax.jit(lambda v, lv, p: model.apply(v, lv, p, method=IFNet.query))
    f_q = lambda v, lv, p: query(v, lv, p)[0, 0].item()
    dt = timeit(f_q, variables, levels, pts_q)
    print(
        f"IFNet.query     (B={B}, {N_POINTS} pts): {dt*1e3:8.2f} ms"
        f"  ({B*N_POINTS/dt/1e6:.2f} M pts/s)"
    )

    f_enc = lambda v, g: encode(v, g).flats[-1][0, 0, 0].item()
    print(f"IFNet.encode    (B={B}):            {timeit(f_enc, variables, grid)*1e3:8.2f} ms")

    # query backward (grads into pyramid AND points)
    def qloss(v, lv, p):
        return jnp.sum(model.apply(v, lv, p, method=IFNet.query) ** 2)

    gq = jax.jit(jax.grad(qloss, argnums=(1, 2)))
    f_gq = lambda v, lv, p: gq(v, lv, p)[1][0, 0, 0].item()
    print(f"query grad      (B={B}, {N_POINTS} pts): {timeit(f_gq, variables, levels, pts_q)*1e3:8.2f} ms")

    return _finish(args, rng, pts_q)


def _finish(args, rng, pts_q):
    _steps(args, rng, pts_q)
    if args.set == "all":
        _serving(rng)


def _serving(rng):
    """Image->mesh serving tail: dense sweep + device->host pull per
    transfer dtype (the A/B that decides implicit_to_mesh's default), then
    host marching cubes + the native OBJ write."""
    import time

    import jax
    import jax.numpy as jnp

    from sv3d_tpu.config import Config
    from sv3d_tpu.inference.dense_grid import evaluate_on_grid
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.utils.visualize import visualize_sdf

    model = IFNet(Config(net_res=128).ifnet())
    grid = (jax.random.uniform(rng, (1, *DIMS, 1)) > 0.97).astype(jnp.float32)
    variables = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(1), grid, jnp.zeros((1, 8, 3)), train=False
        )
    )()
    value = None
    for name, dt_ in (("f32", jnp.float32), ("f16", jnp.float16),
                      ("u8", jnp.uint8)):
        def run():
            return evaluate_on_grid(
                model, variables, grid, DIMS, res_increase=2, slab_rows=8,
                transfer_dtype=dt_,
            )

        run()
        run()
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            value = run()
            times.append(time.perf_counter() - t0)
        print(f"dense sweep r_inc=2 + {name} pull:  {min(times)*1e3:8.1f} ms")
    t0 = time.perf_counter()
    visualize_sdf(1.0 - value, "/tmp/measure_serving.obj", 0.5)
    print(f"marching cubes + native obj write:  "
          f"{(time.perf_counter() - t0)*1e3:8.1f} ms")


def _steps(args, rng, pts_q):
    """Full scene-net train steps (fwd+bwd+adam) across precision/fused
    configs, with XLA's issued-flop estimate -> MFU per config."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _INTRINSICS
    from sv3d_tpu.config import Config
    from sv3d_tpu.geometry.frustum import FrustumGrid
    from sv3d_tpu.models.scene_net import SceneNet
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state
    from sv3d_tpu.training.trainer_scene_net import make_train_step

    # full-scale f32 at B=8 needs ~17 GB (XLA keeps (...,16) conv cotangents
    # in an 8x lane-padded layout) — measure the configs that fit a 16 GB v5e.
    # fused=True routes queries through the Pallas kernels (Config.fused_query);
    # precision=16 there means bf16 UNet/IF-Net encoder convs with the f32
    # kernel interface (the conv-bound-remainder lever, VERDICT r2 item 7).
    base_cfgs = [(4, 32, False), (8, 16, False)]
    fused_cfgs = [(4, 32, True), (4, 16, True), (8, 16, True)]
    step_cfgs = {"base": base_cfgs, "fused": fused_cfgs,
                 "all": base_cfgs + fused_cfgs}[args.set]

    for bsz, precision, fused in step_cfgs:
        cfg = Config(seed=0, num_points=2048, batch_size=bsz, net_res=128,
                     precision=precision, fused_query=fused)
        frustum = FrustumGrid.create(_INTRINSICS, voxel_size=0.05)
        snet = SceneNet(cfg, _INTRINSICS, frustum)
        rgb = jax.random.uniform(rng, (bsz, 240, 320, 3), jnp.float32, -1, 1)
        depth_t = jnp.full((bsz, 240, 320), 2.0)
        pts_b = pts_q[:bsz]
        occ = (jax.random.uniform(rng, (bsz, N_POINTS)) > 0.5).astype(jnp.float32)
        svars = snet.init(jax.random.PRNGKey(2), rgb[:1], depth_t[:1], pts_b[:1], train=False)
        state = create_train_state(snet, svars, build_optimizer(1e-4, svars["params"]))
        step = make_train_step(snet, cfg)

        def f_step(state, rgb, depth_t, p, occ):
            s2, m = step(state, rgb, depth_t, p, occ, jax.random.PRNGKey(3))
            return m["train_loss"].item()

        tag = f"B={bsz}, f{precision}" + (", fused" if fused else "")
        dt = timeit(f_step, state, rgb, depth_t, pts_b, occ)
        # XLA's own flop estimate for the whole step -> model FLOP utilization
        # (v5e peak: 197 TFLOP/s bf16; conservative yardstick for f32 configs
        # too, since MXU f32 matmuls lower to bf16x passes)
        mfu = ""
        try:
            lowered = jax.jit(step).lower(
                state, rgb, depth_t, pts_b, occ, jax.random.PRNGKey(3)
            )
            ca = lowered.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0))
            if flops > 0:
                mfu = (f"  [{flops/1e9:.1f} GFLOP issued, "
                       f"{flops/dt/1e12:.1f} TFLOP/s = "
                       f"{flops/dt/197e12*100:.1f}% bf16 peak]")
        except Exception as e:  # cost model availability varies per backend
            mfu = f"  [cost_analysis unavailable: {type(e).__name__}]"
        print(f"train step      ({tag}): {dt*1e3:8.2f} ms"
              f"  ({bsz/dt:.1f} samples/s){mfu}")


if __name__ == "__main__":
    main()
