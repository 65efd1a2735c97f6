"""Quality-parity check: overfit the scene pipeline on the reference fixture,
extract the predicted mesh, and score IoU / Chamfer-L2 / normal consistency
against the GT mesh (the reference's own eval protocol, util/evaluate.py).

Mirrors the reference's viability experiment (BASELINE.md: GT depth +
diff-voxelization + IF-Net) at full scale on the single overfit sample.

Usage: python scripts/quality_overfit.py [--steps 3000] [--net_res 128]
Writes results JSON to runs/<experiment>/quality.json and prints it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# persistent compile cache: a retried/resumed run (tunnel outages are routine)
# skips the multi-minute full-scale train-step recompile
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", str(Path(__file__).parent.parent / ".jax_cache")
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--net_res", type=int, default=128)
    p.add_argument(
        "--scale_factor", type=int, default=1,
        help="2 = the reference report's half-scale viability config "
        "(70x52x56 grid; pair with --net_res 32)",
    )
    p.add_argument("--datasetdir", default="data")
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval_points", type=int, default=50000)
    p.add_argument("--out", default=None,
                   help="results JSON path (default <exp>/quality.json); "
                   "NOT the experiment dir — that's --exp")
    p.add_argument("--exp", default=None,
                   help="experiment dir override (default runs/quality_e2e "
                   "with --use_unet, else runs/quality_overfit)")
    p.add_argument("--resume_last", action="store_true",
                   help="continue from <exp>/checkpoints/last if present "
                   "(tunnel-outage recovery; a completed run skips straight "
                   "to mesh extraction + eval)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument(
        "--use_unet", action="store_true",
        help="full end-to-end protocol: train the UNet jointly and reconstruct "
        "from PREDICTED depth (reference's end-to-end row; default is the "
        "GT-depth viability protocol)",
    )
    p.add_argument("--pretrain_unet", default=None)
    p.add_argument("--precision", type=int, default=32)
    p.add_argument("--fused_query", action="store_true",
                   help="train through the Pallas MXU query kernels")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sv3d_tpu.config import Config
    from sv3d_tpu.evaluation.metrics import eval_mesh
    from sv3d_tpu.inference.dense_grid import implicit_to_mesh
    from sv3d_tpu.io.mesh import load_obj
    from sv3d_tpu.models.ifnet import IFNet
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    cfg = Config(
        datasetdir=args.datasetdir,
        splitsdir="overfit",
        skip_unet=not args.use_unet,
        pretrain_unet=args.pretrain_unet,
        precision=args.precision,
        fused_query=args.fused_query,
        scale_factor=args.scale_factor,
        num_points=args.num_points,
        batch_size=1,
        max_epoch=10_000,
        seed=0,
        sanity_steps=0,
        net_res=args.net_res,
        lr=args.lr,
        experiment="quality_overfit",
        val_check_interval=1e9,
    )
    default_dir = "runs/quality_e2e" if args.use_unet else "runs/quality_overfit"
    out_dir = Path(args.exp) if args.exp else Path(default_dir)
    if args.resume_last and (out_dir / "checkpoints" / "last").exists():
        import dataclasses

        cfg = dataclasses.replace(
            cfg, resume=str(out_dir / "checkpoints" / "last")
        )
        print(f"resuming from {cfg.resume}", flush=True)
    trainer = SceneNetTrainer(cfg, experiment_dir=out_dir)

    t0 = time.time()
    state = trainer.fit(max_steps=args.steps)
    train_s = time.time() - t0
    print(f"trained {args.steps} steps in {train_s:.1f}s "
          f"({args.steps / train_s:.2f} steps/s)", flush=True)

    # build the voxel occupancy exactly as in training: from PREDICTED depth
    # (end-to-end protocol) or GT depth (viability protocol)
    batch = trainer.train_dataset()[0]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.use_unet:
        rgb = jnp.asarray(batch["rgb"])[None]
        depth_in = trainer.model.apply(
            variables, rgb, train=False, method="predict_depth"
        )
    else:
        depth_in = jnp.asarray(batch["depthmap_target"])[None]
    pc = trainer.model.apply(variables, depth_in, method="project_depth")
    vox = trainer.model.apply(variables, pc, method=lambda m, p: m.project(p))

    ifnet = IFNet(cfg.ifnet())
    ifnet_vars = {
        "params": jax.device_get(state.params)["ifnet"],
        "batch_stats": jax.device_get(state.batch_stats).get("ifnet", {}),
    }
    pred_path = out_dir / "predicted.obj"
    t0 = time.time()
    implicit_to_mesh(ifnet, ifnet_vars, vox, cfg.dims, 0.5, pred_path)
    mesh_s = time.time() - t0
    print(f"mesh extracted in {mesh_s:.1f}s -> {pred_path}", flush=True)

    # normalize both meshes into unit space (reference convert_to_scaled_obj).
    # The prediction lives in the RUN's grid coords (cfg.dims — 70x52x56 at
    # half scale); the fixture GT mesh is always in FULL-dims grid coords.
    from sv3d_tpu.config import FULL_DIMS

    dims = np.asarray(cfg.dims, dtype=np.float64)
    full_dims = np.asarray(FULL_DIMS, dtype=np.float64)
    pred = load_obj(pred_path).apply_translation(-dims / 2).apply_scale(1.0 / dims)
    gt = load_obj(Path(args.datasetdir) / "raw" / "overfit" / "00000" / "mesh.obj")
    gt.apply_translation(-full_dims / 2).apply_scale(1.0 / full_dims)

    metrics = eval_mesh(pred, gt, -0.5, 0.5, n_points=args.eval_points)
    result = {
        "steps": args.steps,
        "fused_query": bool(args.fused_query),
        "train_seconds": round(train_s, 1),
        "steps_per_sec": round(args.steps / train_s, 3),
        # single cold extraction: dominated by XLA/Mosaic compilation of the
        # sweep (the warm number is bench.py's scene_seconds, ~3 s)
        "mesh_seconds_cold": round(mesh_s, 2),
        "protocol": (
            "pretrained_unet" if (args.use_unet and args.pretrain_unet)
            else "end_to_end" if args.use_unet
            else "viability_gt_depth"
        ),
        "scale_factor": args.scale_factor,
        "net_res": args.net_res,
        "iou": round(metrics["iou"], 4),
        "chamfer_l2": round(metrics["chamfer_l2"], 6),
        "normals": round(metrics["normals"], 4),
        # reference report Table 1 rows (BASELINE.md): pretrained-UNet 0.43,
        # end-to-end 0.40, viability (GT depth, half-scale) 0.48
        "reference": (
            {"iou": 0.43, "chamfer_l2": 0.0065, "normals": 0.82}
            if (args.use_unet and args.pretrain_unet)
            else {"iou": 0.40, "chamfer_l2": 0.0094, "normals": 0.77}
            if args.use_unet
            else {"iou": 0.48, "chamfer_l2": 0.0007, "normals": 0.82}
        ),
        "note": (
            "OVERFIT protocol: train and eval on the SAME single fixture "
            "sample (pipeline-correctness check, not generalization).  The "
            "embedded `reference` numbers are the reference report's "
            "TEST-SPLIT MEANS over 291 held-out scenes (BASELINE.md) — "
            "apples-to-oranges with this artifact's iou; see "
            "QUALITY_MULTISCENE_*.json for the held-out-scene counterpart"
        ),
    }
    out_path = Path(args.out) if args.out else out_dir / "quality.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
