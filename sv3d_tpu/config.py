"""Explicit configuration for the framework.

The reference funnels all configuration through a single argparse namespace that
is parsed at *module import time* (reference util/arguments.py:7-64, imported by
model/ifnet.py:8).  Here config is an explicit dataclass passed down the stack;
nothing global, everything jit-friendly (static fields only).
"""

from __future__ import annotations

import dataclasses
import random
from dataclasses import dataclass, field
from datetime import datetime
from pathlib import Path
from typing import Sequence


# Default frustum grid dimensions at voxel size 0.05 m, depth 0.4-6.0 m,
# 320x240 images (reference model/projection.py:156-157 and
# trainer/trainer_scene_net.py:30).
FULL_DIMS = (139, 104, 112)

# Per-dataset depth normalisation range (reference util/arguments.py:38-41).
DEFAULT_MIN_Z = 0.1953997164964676
DEFAULT_MAX_Z = 7.0


def _triple(v) -> tuple:
    if isinstance(v, (int, float)):
        return (v, v, v)
    t = tuple(v)
    if len(t) == 1:
        return t * 3
    assert len(t) == 3, f"expected scalar or 3-tuple, got {v!r}"
    return t


@dataclass(frozen=True)
class ProjectionConfig:
    """Depth back-projection + differentiable voxelization settings
    (reference model/projection.py:21-37)."""

    dims: tuple = FULL_DIMS
    kernel_size: tuple = (3, 3, 3)
    init_sigma: tuple = (1.5, 1.5, 1.5)
    depth_min: float = 0.4
    depth_max: float = 6.0
    voxel_size: float = 0.05
    image_size: tuple = (320, 240)  # (width, height)

    def __post_init__(self):
        object.__setattr__(self, "kernel_size", _triple(self.kernel_size))
        object.__setattr__(self, "init_sigma", _triple(self.init_sigma))


@dataclass(frozen=True)
class IFNetConfig:
    """IF-Net architecture (reference model/ifnet.py:10-61)."""

    net_res: int = 128          # 128 or 32 feature-pyramid variant
    hidden_dim: int = 256
    displacement: float = 0.0722  # 0.035 for the 32-res variant
    #: route training/eval queries through the MXU-fused Pallas kernels
    #: (bf16 compute with f32 accumulation — a mixed-precision mode; the
    #: default XLA gather path is exact f32)
    fused_query: bool = False

    @property
    def feature_channels(self) -> tuple:
        if self.net_res == 128:
            return (1, 16, 32, 64, 128, 128)
        if self.net_res == 32:
            return (1, 64, 128, 128)
        raise ValueError(f"net_res must be 128 or 32, got {self.net_res}")

    @property
    def align_corners(self) -> bool:
        # The 32-res variant samples with align_corners=True
        # (reference model/ifnet.py:98), the 128-res variant with the torch
        # default align_corners=False (reference model/ifnet.py:162).
        return self.net_res == 32

    @staticmethod
    def for_net_res(
        net_res: int, hidden_dim: int = 256, fused_query: bool = False
    ) -> "IFNetConfig":
        disp = 0.0722 if net_res == 128 else 0.035
        return IFNetConfig(
            net_res=net_res, hidden_dim=hidden_dim, displacement=disp,
            fused_query=fused_query,
        )


@dataclass(frozen=True)
class Config:
    """Full run configuration — one field per reference CLI flag
    (reference util/arguments.py:7-64)."""

    # data
    datasetdir: str = "data"
    splitsdir: str = "overfit"
    num_workers: int = 0
    num_points: int = 2048
    W: int = 256                      # square resize target when resize_input
    resize_input: bool = False
    #: horizontal-flip augmentation on the TRAIN split of the end-to-end
    #: dataset.  The reference only flips in UNet-only training (its
    #: scenes_dataset.py flips both input and target); here the flip extends
    #: to the full pipeline: rgb and depth are column-reversed and the query
    #: points are mirrored about the frustum's camera-x plane with the EXACT
    #: grid-space constant 2*camera2frustum[0,3] (cx = (W-1)/2 makes the
    #: pixel-grid mirror exact; the frustum box itself is one voxel row
    #: asymmetric, so the mirror plane is NOT the grid center).
    flip_aug: bool = False
    precision: int = 32               # 32 or 16 (bfloat16 on TPU)

    # model
    net_res: int = 128
    inf_res: int = 1                  # inference resolution multiplier
    scale_factor: int = 1             # voxel grid downscale factor
    kernel_size: Sequence[int] = (3, 3, 3)
    sigma: Sequence[float] = (1.5,)
    min_z: float = DEFAULT_MIN_Z
    max_z: float = DEFAULT_MAX_Z
    skip_unet: bool = False
    no_depth_sup: bool = False
    subsample_points: int = 0
    fused_query: bool = False     # Pallas MXU query path in training (TPU)

    # training
    lr: float = 1e-4
    batch_size: int = 16
    #: >1 = gradient accumulation: the batch is split into this many
    #: microbatches scanned sequentially (grads averaged, one optimizer
    #: step) — full-scale f32 batches beyond HBM train unchanged.
    accum_steps: int = 1
    max_epoch: int = 100
    save_epoch: int = 1
    seed: int = -1
    sanity_steps: int = 2
    val_check_percent: float = 0.5
    val_check_interval: float = 0.25
    #: checkpoint-ranking metric override; "" keeps the trainer's default
    #: (scene trainer: val_ce_loss, matching the reference's ModelCheckpoint
    #: monitor, trainer_scene_net.py:217).  "val_point_iou" (monitor_mode
    #: "max") is the robust choice for generalization runs: val CE is
    #: minimized by a constant base-rate predictor early in training, which
    #: meshes to garbage — point IoU is 0 there.
    monitor: str = ""
    #: "min" | "max" | "" (trainer default) — ranking direction for `monitor`
    monitor_mode: str = ""
    resume: str | None = None
    pretrain_unet: str | None = None
    test: str | None = None

    # logging / experiment
    experiment: str = "scenes_net"
    version: str | None = None
    visualize: bool = False
    profiler: str | None = None

    # parallelism (new; the reference is single-device)
    dp: int = 1                       # data-parallel mesh size
    sp: int = 1                       # point-sharding mesh size

    def __post_init__(self):
        object.__setattr__(self, "kernel_size", _triple(tuple(self.kernel_size)))
        object.__setattr__(self, "sigma", _triple(tuple(self.sigma)))
        if self.seed == -1:
            object.__setattr__(self, "seed", random.randint(0, 999))
        # fused_query + precision=16 is a supported combination: the UNet and
        # IF-Net encoder convs run bf16 (MXU-native) while the fused Pallas
        # query keeps its float32 interface — query_fused casts the pyramid
        # back to f32 at its boundary (it is already bf16-compute inside with
        # f32 accumulation, so module-level bf16 adds nothing to the query
        # itself; what precision=16 buys with fused_query is bf16 convs).
        if self.fused_query and self.net_res == 32 and self.scale_factor < 2:
            # Measured on v5e: the 32-res pyramid keeps a 64-channel level at
            # FULL grid resolution, so the fused kernel's per-slab VMEM table
            # is (rows, 104, 112*64)*2B ≈ 25 MB and its Mosaic compile runs
            # >10 minutes at dims (139, 104, 112).  At the variant's intended
            # scale (reference report §3.2 trains 32-res at half scale,
            # scale_factor>=2) it compiles fine (verified on TPU, logit diff
            # 4e-4).  See ARCHITECTURE.md "Known limitations".
            raise ValueError(
                "fused_query with net_res=32 requires scale_factor >= 2: at "
                "full dims (139, 104, 112) the 64-channel full-resolution "
                "level's Mosaic kernel compiles >10 min (25 MB VMEM slab "
                "table).  Use scale_factor>=2 (the 32-res variant's intended "
                "half-scale config) or net_res=128."
            )

    @property
    def dims(self) -> tuple:
        return tuple(int(round(d / self.scale_factor)) for d in FULL_DIMS)

    @property
    def dtype(self):
        import jax.numpy as jnp

        return jnp.float32 if self.precision == 32 else jnp.bfloat16

    def projection(self) -> ProjectionConfig:
        return ProjectionConfig(
            dims=self.dims,
            kernel_size=tuple(self.kernel_size),
            init_sigma=tuple(self.sigma),
            voxel_size=0.05 * self.scale_factor,
        )

    def ifnet(self) -> IFNetConfig:
        return IFNetConfig.for_net_res(self.net_res, fused_query=self.fused_query)

    def experiment_dir(self, timestamp: bool = True) -> Path:
        name = self.experiment
        if timestamp:
            name = f"{datetime.now().strftime('%d%m%H%M')}_{name}"
        return Path("runs") / name

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
