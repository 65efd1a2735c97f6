"""CLI flag parsing -> Config (mirrors reference util/arguments.py:7-64 flag
for flag, but produces an explicit Config instead of a global namespace)."""

from __future__ import annotations

import argparse

from sv3d_tpu.config import DEFAULT_MAX_Z, DEFAULT_MIN_Z, Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="sv3d_tpu trainer")
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--sanity_steps", type=int, default=2)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--splitsdir", type=str, default="overfit")
    p.add_argument("--datasetdir", type=str, default="data")
    p.add_argument("--val_check_percent", type=float, default=0.5)
    p.add_argument("--val_check_interval", type=float, default=0.25)
    p.add_argument("--max_epoch", type=int, default=100)
    p.add_argument("--save_epoch", type=int, default=1)
    p.add_argument("--monitor", type=str, default="",
                   help="checkpoint-ranking metric (default: trainer's, "
                   "val_ce_loss for the scene trainer); val_point_iou with "
                   "--monitor_mode max avoids CE's constant-predictor trap")
    p.add_argument("--monitor_mode", type=str, default="",
                   choices=["", "min", "max"])
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--accum_steps", type=int, default=1,
                   help="gradient-accumulation microbatches per step")
    p.add_argument("--experiment", type=str, default="scenes_net")
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--W", type=int, default=256)
    p.add_argument("--sigma", nargs="+", type=float, default=[1.5])
    p.add_argument("--kernel_size", nargs="+", type=int, default=[3, 3, 3])
    p.add_argument("--num_points", type=int, default=2048)
    p.add_argument("--net_res", type=int, default=128)
    p.add_argument("--inf_res", type=int, default=1)
    p.add_argument("--precision", type=int, default=32)
    p.add_argument("--profiler", type=str, default=None)
    p.add_argument("--version", type=str, default=None)
    p.add_argument("--resize_input", action="store_true")
    p.add_argument("--flip_aug", action="store_true",
                   help="exact-mirror horizontal flip augmentation on the "
                   "end-to-end train split (see Config.flip_aug)")
    p.add_argument("--pretrain_unet", default=None)
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--min_z", type=float, default=DEFAULT_MIN_Z)
    p.add_argument("--max_z", type=float, default=DEFAULT_MAX_Z)
    p.add_argument("--scale_factor", type=int, default=1)
    p.add_argument("--subsample_points", type=int, default=0)
    p.add_argument("--skip_unet", action="store_true")
    p.add_argument("--no_depth_sup", action="store_true")
    p.add_argument("--test", type=str, default=None)
    p.add_argument(
        "--fused_query", action="store_true",
        help="train through the Pallas MXU point-query kernels (bf16 "
        "compute, f32 accumulation; ~1.9x faster full-scale train step)",
    )
    # parallelism (new)
    p.add_argument("--dp", type=int, default=1, help="data-parallel mesh size")
    p.add_argument("--sp", type=int, default=1, help="point-sharding mesh size")
    # multi-host (DCN): explicit cluster coordinates; omit all three for
    # single-host or env/metadata-based auto-detection
    p.add_argument("--coordinator_address", type=str, default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def parse_config(argv=None) -> Config:
    args = vars(build_parser().parse_args(argv))
    # join the multi-host cluster BEFORE any jax backend use (no-op when the
    # flags are absent and no cluster environment is detected)
    from sv3d_tpu.parallel.multihost import initialize_distributed

    initialize_distributed(
        coordinator_address=args.pop("coordinator_address"),
        num_processes=args.pop("num_processes"),
        process_id=args.pop("process_id"),
    )
    return Config(**args)
