"""Per-scene failure diagnosis for held-out generalization runs.

The r4 multiscene artifacts show huge per-scene IoU variance (0.02-0.67);
the mean dies on a few near-zero scenes.  The end-to-end pipeline has one
obvious upstream suspect — the UNet's depth prediction on room geometries it
never saw — and this script isolates it per test scene:

  * predicted-vs-GT depth error (masked MAE / relative error, worst-pixel
    stats) — a scene whose depth is wrong cannot reconstruct;
  * back-projected cloud containment (fraction of pixels whose projected
    points land inside the frustum grid) — out-of-frustum clouds voxelize
    to nothing;
  * optional (--full, needs the chip): the dense sweep + mesh for both
    predicted AND GT depth, scoring each against the GT mesh, which splits
    the IoU loss into "depth error" vs "IF-Net generalization" parts.

Writes <exp>/diagnosis/{scene}_depth.png (GT | predicted | abs error) and a
summary JSON to stdout + <exp>/diagnosis/summary.json.

Usage:
  python scripts/diagnose_scenes.py --exp runs/scaling_96 --root .synth_quality \
      [--ckpt runs/scaling_96/checkpoints/step_XXXX] [--cpu] [--full]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", required=True)
    p.add_argument("--root", default=".synth_quality")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir (default: manifest best, else last)")
    p.add_argument("--net_res", type=int, default=128)
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--eval_points", type=int, default=50000)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--full", action="store_true",
                   help="also mesh from predicted AND GT depth and score "
                   "both (dense sweeps — run on the chip)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from sv3d_tpu.config import Config
    from sv3d_tpu.training.checkpoint import load_state_from_checkpoint
    from sv3d_tpu.training.trainer_scene_net import SceneNetTrainer

    exp = Path(args.exp)
    cfg = Config(
        datasetdir=args.root, splitsdir="synth", skip_unet=False,
        num_points=args.num_points, batch_size=1, seed=0, sanity_steps=0,
        net_res=args.net_res, experiment="diagnose",
    )
    trainer = SceneNetTrainer(cfg, experiment_dir=exp / "diagnosis_tmp")
    ckpt_dir = exp / "checkpoints"
    ckpt = Path(args.ckpt) if args.ckpt else ckpt_dir / "last"
    manifest = ckpt_dir / "manifest.json"
    if not args.ckpt and manifest.exists():
        scores = json.loads(manifest.read_text())["scores"]
        if scores:
            ckpt = Path(scores[0][1])
    print(f"diagnosing checkpoint {ckpt}", flush=True)
    state = trainer.build_state(trainer._next_rng())
    state = load_state_from_checkpoint(state, ckpt)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    out_dir = exp / "diagnosis"
    out_dir.mkdir(parents=True, exist_ok=True)
    test_ds = trainer.test_dataset()
    dims = np.asarray(cfg.dims, dtype=np.float64)

    predict_depth = jax.jit(
        lambda v, rgb: trainer.model.apply(
            v, rgb, train=False, method="predict_depth"
        )
    )
    project = jax.jit(
        lambda v, d: trainer.model.apply(v, d, method="project_depth")
    )

    rows = []
    for i in range(len(test_ds)):
        sample = test_ds[i]
        name = sample["name"].replace("/", "_")
        gt = np.asarray(sample["depthmap_target"])  # (H, W)
        pred = np.asarray(
            predict_depth(variables, jnp.asarray(sample["rgb"])[None])
        )[0]
        err = np.abs(pred - gt)
        # projected-cloud containment: normed grid space is [-0.5, 0.5]^3
        pc_pred = np.asarray(project(variables, jnp.asarray(pred)[None]))[0]
        pc_gt = np.asarray(project(variables, jnp.asarray(gt)[None]))[0]
        inside = lambda pc: float(
            np.mean(np.all(np.abs(pc) <= 0.5 + 1e-6, axis=-1))
        )
        row = {
            "name": sample["name"],
            "depth_mae": round(float(err.mean()), 4),
            "depth_mae_rel": round(float((err / np.maximum(gt, 0.1)).mean()), 4),
            "depth_p95_err": round(float(np.percentile(err, 95)), 4),
            "gt_depth_range": [round(float(gt.min()), 3), round(float(gt.max()), 3)],
            "cloud_in_frustum_pred": round(inside(pc_pred), 4),
            "cloud_in_frustum_gt": round(inside(pc_gt), 4),
        }

        # side-by-side depth panel: GT | predicted | abs error
        lo, hi = gt.min(), max(gt.max(), pred.max())
        norm = lambda d: ((np.clip(d, lo, hi) - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8)
        panel = np.concatenate(
            [norm(gt), norm(pred), (np.clip(err / max(hi - lo, 1e-6), 0, 1) * 255).astype(np.uint8)],
            axis=1,
        )
        Image.fromarray(panel).save(out_dir / f"{name}_depth.png")

        if args.full:
            from sv3d_tpu.evaluation.metrics import eval_mesh
            from sv3d_tpu.inference.dense_grid import implicit_to_mesh
            from sv3d_tpu.io.mesh import load_obj
            from sv3d_tpu.models.ifnet import IFNet

            ifnet = IFNet(cfg.ifnet())
            ifnet_vars = {
                "params": jax.device_get(state.params)["ifnet"],
                "batch_stats": jax.device_get(state.batch_stats).get("ifnet", {}),
            }
            gt_mesh = load_obj(Path(sample["mesh"]))
            gt_mesh.apply_translation(-dims / 2).apply_scale(1.0 / dims)
            for tag, depth_in in (("pred", pred), ("gtdepth", gt)):
                pc = project(variables, jnp.asarray(depth_in)[None])
                vox = trainer.model.apply(
                    variables, pc, method=lambda m, p: m.project(p)
                )
                mesh_path = out_dir / f"{name}_{tag}.obj"
                try:
                    implicit_to_mesh(
                        ifnet, ifnet_vars, vox, cfg.dims, 0.5, mesh_path
                    )
                    pm = load_obj(mesh_path)
                    pm.apply_translation(-dims / 2).apply_scale(1.0 / dims)
                    m = eval_mesh(pm, gt_mesh, -0.5, 0.5,
                                  n_points=args.eval_points)
                    row[f"iou_{tag}"] = round(m["iou"], 4)
                except (ValueError, RuntimeError) as e:
                    row[f"iou_{tag}"] = 0.0
                    row[f"iou_{tag}_error"] = str(e)[:100]

        rows.append(row)
        print(json.dumps(row), flush=True)

    summary = {
        "checkpoint": str(ckpt),
        "scenes": rows,
        "worst_depth": sorted(rows, key=lambda r: -r["depth_mae"])[:2],
    }
    (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
    print(f"wrote {out_dir}/summary.json", flush=True)


if __name__ == "__main__":
    main()
