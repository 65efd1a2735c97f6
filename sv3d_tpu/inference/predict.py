"""Standalone serving CLI: RGB image -> reconstructed scene mesh.

The reference only produces meshes through its training harness
(`trainer/trainer_scene_net.py:234-240` --test over a processed data tree);
this entry point serves raw inputs directly — one jitted forward from the
image to the voxel occupancy, then the encode-once dense sweep and host
marching cubes:

    python -m sv3d_tpu.inference.predict \
        --checkpoint runs/<exp>/checkpoints/last \
        --rgb scene/rgb.png --intrinsics scene/intrinsic.txt --out out/

Multiple --rgb paths (or a directory of *.png) batch through the same
compiled programs.  --distance serves the GT-depth pipeline (reference
--skip_unet): the depth map comes from a distance EXR instead of the UNet.
Model flags must match the checkpoint's architecture (net_res, W,
resize_input, scale_factor are NOT stored in orbax checkpoints — pass the
same values used in training, exactly like the reference's --test path
re-parses its CLI).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    from sv3d_tpu.config import DEFAULT_MAX_Z, DEFAULT_MIN_Z

    p = argparse.ArgumentParser(description="sv3d_tpu image->mesh serving")
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (e.g. runs/<exp>/checkpoints/last)")
    p.add_argument("--rgb", nargs="+", default=[],
                   help="rgb image path(s), or a directory of *.png")
    p.add_argument("--distance", nargs="+", default=[],
                   help="distance EXR path(s) — serve the GT-depth pipeline "
                   "(reference --skip_unet) instead of the UNet")
    p.add_argument("--intrinsics", default=None,
                   help="intrinsic.txt (default: alongside the first input)")
    p.add_argument("--out", default="predictions")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="occupancy iso-level for marching cubes")
    # architecture flags (must match the checkpoint)
    p.add_argument("--net_res", type=int, default=128)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--resize_input", action="store_true")
    p.add_argument("--scale_factor", type=int, default=1)
    p.add_argument("--inf_res", type=int, default=1)
    p.add_argument("--precision", type=int, default=32)
    p.add_argument("--min_z", type=float, default=DEFAULT_MIN_Z)
    p.add_argument("--max_z", type=float, default=DEFAULT_MAX_Z)
    p.add_argument("--sigma", nargs="+", type=float, default=[1.5])
    p.add_argument("--kernel_size", nargs="+", type=int, default=[3, 3, 3])
    p.add_argument("--skip_unet", action="store_true",
                   help="the checkpoint was trained WITHOUT a UNet "
                   "(reference --skip_unet); required to match its "
                   "parameter tree when serving --distance inputs")
    p.add_argument("--dump_depth", action="store_true",
                   help="also write the predicted depth map (.png + .exr)")
    return p


def _expand(paths, suffix):
    out = []
    for s in paths:
        q = Path(s)
        out.extend(sorted(q.glob(f"*{suffix}")) if q.is_dir() else [q])
    return out


def load_model(args):
    """Build (model, ifnet, state) for serving from CLI args + checkpoint."""
    import jax
    import jax.numpy as jnp

    from sv3d_tpu.config import Config
    from sv3d_tpu.geometry.camera import read_intrinsics
    from sv3d_tpu.geometry.frustum import FrustumGrid
    from sv3d_tpu.models.scene_net import SceneNet
    from sv3d_tpu.training.checkpoint import load_state_from_checkpoint
    from sv3d_tpu.training.optim import build_optimizer
    from sv3d_tpu.training.state import create_train_state

    config = Config(
        net_res=args.net_res, W=args.W, resize_input=args.resize_input,
        scale_factor=args.scale_factor, inf_res=args.inf_res,
        precision=args.precision, min_z=args.min_z, max_z=args.max_z,
        sigma=args.sigma, kernel_size=args.kernel_size,
        skip_unet=args.skip_unet,  # architecture choice, NOT input type: a
        # full checkpoint can serve --distance inputs (its UNet just idles)
    )
    intrinsics = read_intrinsics(args.intrinsics)
    frustum = FrustumGrid.create(intrinsics, voxel_size=0.05 * config.scale_factor)
    model = SceneNet(config, intrinsics, frustum)

    rng = jax.random.PRNGKey(0)
    rgb0 = jnp.zeros(
        (1, config.W, config.W, 3) if config.resize_input else (1, 240, 320, 3)
    )
    depth0 = jnp.full((1, 240, 320), 2.0)
    variables = jax.jit(
        lambda k: model.init(k, rgb0, depth0, jnp.zeros((1, 8, 3)), train=False)
    )(rng)
    state = create_train_state(
        model, variables, build_optimizer(config.lr, variables["params"])
    )
    state = load_state_from_checkpoint(state, args.checkpoint)
    return config, model, state


from functools import lru_cache


@lru_cache(maxsize=8)
def _fwd_fns(model):
    """Jitted forwards, built ONCE per model so serving many images reuses
    the compiled programs (a per-call jax.jit closure would re-trace per
    image)."""
    import jax

    from sv3d_tpu.models.scene_net import SceneNet

    @jax.jit
    def fwd_rgb(v, img):
        depth = model.apply(v, img, train=False, method=SceneNet.predict_depth)
        pc = model.apply(v, depth, method=SceneNet.project_depth)
        vox = model.apply(v, pc, method=lambda m, p: m.project(p))
        return vox, depth

    @jax.jit
    def fwd_depth(v, d):
        pc = model.apply(v, d, method=SceneNet.project_depth)
        return model.apply(v, pc, method=lambda m, p: m.project(p)), d

    return fwd_rgb, fwd_depth


def predict(config, model, state, rgb=None, distance=None, intrinsics=None):
    """One sample -> (voxel_occupancy (1, *dims, 1), depthmap (240, 320)).

    rgb: (H, W, 3) normalized float32, or None with a distance map for the
    GT-depth pipeline."""
    import jax.numpy as jnp

    from sv3d_tpu.geometry.camera import distance_to_depth

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd_rgb, fwd_depth = _fwd_fns(model)

    if rgb is not None:
        vox, depth = fwd_rgb(variables, jnp.asarray(rgb)[None])
    else:
        depth_np = np.asarray(
            distance_to_depth(jnp.asarray(distance), intrinsics.focal_length)
        )
        vox, depth = fwd_depth(variables, jnp.asarray(depth_np)[None])
    return vox, np.asarray(depth[0])


def main(argv=None):
    args = build_parser().parse_args(argv)
    if bool(args.rgb) == bool(args.distance):
        sys.exit("pass exactly one of --rgb / --distance")
    if args.skip_unet and args.rgb:
        sys.exit(
            "--skip_unet builds the model WITHOUT a UNet (checkpoints trained "
            "with skip_unet have no depth regressor), so it cannot serve --rgb "
            "inputs; pass --distance EXRs instead"
        )
    inputs = _expand(args.rgb or args.distance, ".png" if args.rgb else ".exr")
    if not inputs:
        sys.exit("no input files found")
    if args.intrinsics is None:
        cand = inputs[0].parent / "intrinsic.txt"
        if not cand.exists():
            sys.exit(f"--intrinsics not given and {cand} not found")
        args.intrinsics = cand

    from sv3d_tpu.data.datasets import _load_normalized_rgb
    from sv3d_tpu.geometry.camera import read_intrinsics
    from sv3d_tpu.inference.dense_grid import implicit_to_mesh
    from sv3d_tpu.io.exr import read_exr_channel
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.utils.visualize import visualize_depthmap

    config, model, state = load_model(args)
    intrinsics = read_intrinsics(args.intrinsics)
    ifnet = IFNet(config.ifnet())
    ifnet_vars = {
        "params": state.params["ifnet"],
        "batch_stats": state.batch_stats.get("ifnet", {}),
    }
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    for path in inputs:
        t0 = time.perf_counter()
        if args.rgb:
            rgb = _load_normalized_rgb(path, False, config.resize_input, config.W)
            vox, depth = predict(config, model, state, rgb=rgb)
        else:
            vox, depth = predict(
                config, model, state,
                distance=read_exr_channel(path, "R"), intrinsics=intrinsics,
            )
        base = path.stem if path.stem not in ("rgb", "distance") else path.parent.name
        mesh_path = out_dir / f"{base}.obj"
        implicit_to_mesh(
            ifnet, ifnet_vars, vox, config.dims, args.threshold, mesh_path,
            res_increase=config.inf_res,
        )
        if args.dump_depth:
            visualize_depthmap(depth, out_dir / f"{base}_depth", flip=True)
        print(f"{path} -> {mesh_path}  ({time.perf_counter() - t0:.2f}s)")


if __name__ == "__main__":
    main()
