"""Shared training loop: epochs, validation cadence, checkpointing, logging.

Replaces the PyTorch-Lightning Trainer wiring of the reference
(trainer_scene_net.py:226-231): seed control, val_check_interval as a fraction
of an epoch, limit_val_batches, top-k checkpointing on a monitored metric, and
resume — driving jitted train/eval steps instead of a module's training_step.
"""

from __future__ import annotations

import random
import time
from pathlib import Path
from typing import Optional

import jax
import numpy as np

from sv3d_tpu.config import Config
from sv3d_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
from sv3d_tpu.parallel.multihost import is_main_process, process_count, process_index
from sv3d_tpu.training.checkpoint import CheckpointManager, load_state_from_checkpoint
from sv3d_tpu.training.logging import MetricLogger


class BaseTrainer:
    """Subclasses implement:
      build_state(rng_key) -> TrainState
      train_step(state, batch, rng_key) -> (state, metrics dict)
      eval_step(state, batch) -> metrics dict
      train_dataset() / val_dataset() -> dataset objects
      monitor: str — validation metric name used for checkpoint ranking
      visualize(state, batch, out_dir) — optional artifact dumps
    """

    monitor = "val_loss"
    monitor_mode = "min"

    def __init__(self, config: Config, mesh=None, experiment_dir: Optional[Path] = None):
        self.config = config
        random.seed(config.seed)
        np.random.seed(config.seed)
        self.rng = jax.random.PRNGKey(config.seed)

        if mesh is None and config.dp * config.sp > 1:
            mesh = make_mesh(config.dp, config.sp)
        self.mesh = mesh

        # multi-host: only process 0 writes logs/visualizations; checkpoint
        # saves are orbax collectives every process participates in, with
        # process 0 doing the filesystem bookkeeping (the PL rank-zero
        # convention; state is replicated so process 0 holds everything)
        self.is_main = is_main_process()
        self.exp_dir = Path(experiment_dir) if experiment_dir else config.experiment_dir()
        if self.is_main:
            self.exp_dir.mkdir(parents=True, exist_ok=True)
        if config.monitor:
            self.monitor = config.monitor
            if not config.monitor_mode:
                # infer the ranking direction from the metric name so
                # `--monitor val_ce_loss` on a max-mode trainer (or
                # `--monitor val_point_iou` on a min-mode one) cannot
                # silently rank in the wrong direction
                self.monitor_mode = "max" if self.monitor.endswith("_iou") else "min"
        if config.monitor_mode:
            self.monitor_mode = config.monitor_mode
        self.ckpt = CheckpointManager(
            self.exp_dir / "checkpoints", primary=self.is_main,
            mode=self.monitor_mode, monitor=self.monitor,
        )
        self.logger = MetricLogger(self.exp_dir / "logs", enabled=self.is_main)
        self.global_step = 0

    # -- subclass hooks ------------------------------------------------------
    def build_state(self, rng_key):
        raise NotImplementedError

    def train_step(self, state, batch, rng_key):
        raise NotImplementedError

    def eval_step(self, state, batch):
        raise NotImplementedError

    def train_dataset(self):
        raise NotImplementedError

    def val_dataset(self):
        raise NotImplementedError

    def visualize(self, state, batch, out_dir: Path):
        pass

    def vis_datasets(self) -> dict:
        """name -> dataset pairs to visualize at validation time (the
        reference keeps dedicated train_vis/val_vis split dataloaders,
        trainer_scene_net.py:57-67,170-188).  Empty dict falls back to
        visualizing the first validation batch."""
        return {}

    # -- loop ----------------------------------------------------------------
    def _loader(self, dataset, shuffle: bool, drop_last: bool):
        from sv3d_tpu.data.loader import DataLoader

        return DataLoader(
            dataset,
            batch_size=self.config.batch_size,
            shuffle=shuffle,
            drop_last=drop_last,
            num_workers=self.config.num_workers,
            seed=self.config.seed,
            process_index=process_index(),
            process_count=process_count(),
        )

    def _next_rng(self):
        self.rng, key = jax.random.split(self.rng)
        return key

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return batch

    def _put_state(self, state):
        if self.mesh is not None:
            return replicate_tree(state, self.mesh)
        return state

    def validate(self, state, loader, max_batches: Optional[int] = None, do_vis=False):
        agg: dict = {}
        count = 0
        first_batch = None
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            metrics = self.eval_step(state, self._put(batch))
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            if i == 0:
                first_batch = batch
            count += 1
        if do_vis and self.config.visualize and self.is_main:
            self._visualize_pass(state, first_batch)
        return {k: v / max(count, 1) for k, v in agg.items()}

    def _visualize_pass(self, state, fallback_batch):
        """Dump artifacts for the dedicated vis splits (reference
        train_vis/val_vis dataloaders); falls back to the first validation
        batch when no vis split exists."""
        vis_dir = self.exp_dir / "vis" / f"{self.global_step // 100:05d}"
        named = self.vis_datasets()
        if named:
            for name, ds in named.items():
                loader = self._loader(ds, shuffle=False, drop_last=False)
                batch = next(iter(loader), None)
                if batch is not None:
                    out = vis_dir / name
                    out.mkdir(parents=True, exist_ok=True)
                    self.visualize(state, self._put(batch), out)
        elif fallback_batch is not None:
            vis_dir.mkdir(parents=True, exist_ok=True)
            self.visualize(state, self._put(fallback_batch), vis_dir)

    def fit(self, max_steps: Optional[int] = None):
        cfg = self.config
        state = self.build_state(self._next_rng())
        if cfg.resume:
            state = load_state_from_checkpoint(state, cfg.resume)
            self.global_step = int(state.step)
        state = self._put_state(state)

        train_loader = self._loader(self.train_dataset(), shuffle=True, drop_last=True)
        val_loader_fn = lambda: self._loader(self.val_dataset(), shuffle=False, drop_last=False)

        steps_per_epoch = max(len(train_loader), 1)
        # PL-1.1 val_check_interval semantics (reference trainer wiring,
        # trainer_scene_net.py:228): a float in (0, 1] is a fraction of the
        # training epoch; an integer > 1 means "every N training batches".
        if cfg.val_check_interval > 1:
            val_every_steps = int(cfg.val_check_interval)
        else:
            val_every_steps = max(int(steps_per_epoch * cfg.val_check_interval), 1)
        n_val = len(val_loader_fn())
        max_val_batches = max(int(n_val * cfg.val_check_percent), 1)

        # sanity validation steps before training (reference num_sanity_val_steps)
        if cfg.sanity_steps > 0:
            self.validate(state, val_loader_fn(), max_batches=cfg.sanity_steps)

        from sv3d_tpu.utils.profiling import StepTimer, trace

        timer = StepTimer() if cfg.profiler else None
        if cfg.profiler == "advanced":
            self._trace_ctx = trace(self.exp_dir / "profile")
            self._trace_ctx.__enter__()

        last_val = {}
        # windowed throughput: steps/sec since the last log line, with
        # validation time excluded, so the logged number reflects steady-state
        # train-step rate rather than a compile-contaminated lifetime average
        log_t0 = time.time()
        log_step0 = self.global_step
        for epoch in range(cfg.max_epoch):
            for batch in train_loader:
                if timer:
                    with timer.section("train_step"):
                        state, metrics = self.train_step(
                            state, self._put(batch), self._next_rng()
                        )
                else:
                    state, metrics = self.train_step(
                        state, self._put(batch), self._next_rng()
                    )
                self.global_step += 1
                if (
                    cfg.profiler == "advanced"
                    and getattr(self, "_trace_ctx", None) is not None
                    and self.global_step >= 20
                ):
                    self._trace_ctx.__exit__(None, None, None)
                    self._trace_ctx = None
                if self.global_step % 10 == 0 or self.global_step == 1:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["steps_per_sec"] = (self.global_step - log_step0) / max(
                        time.time() - log_t0, 1e-9
                    )
                    self.logger.log(metrics, self.global_step)
                    log_t0 = time.time()
                    log_step0 = self.global_step
                if self.global_step % val_every_steps == 0:
                    last_val = self.validate(
                        state, val_loader_fn(), max_batches=max_val_batches, do_vis=True
                    )
                    self.logger.log(last_val, self.global_step)
                    # rank a checkpoint ONLY here, where the monitor score is
                    # fresh (reference ModelCheckpoint-on-validation,
                    # trainer_scene_net.py:217).  Epoch-end saves below pass
                    # no metric: re-ranking a later step with a STALE score
                    # both pollutes top-k (observed: every 24-step epoch
                    # boundary re-entered the manifest with the previous
                    # val's score) and costs an orbax save per epoch.
                    self.ckpt.save(state, metric=last_val.get(self.monitor))
                    log_t0 = time.time()  # exclude validation from the rate window
                    log_step0 = self.global_step
                if max_steps is not None and self.global_step >= max_steps:
                    self.ckpt.save(state)
                    return state
            if (epoch + 1) % max(cfg.save_epoch, 1) == 0:
                self.ckpt.save(state)
        self.ckpt.save(state)
        if getattr(self, "_trace_ctx", None) is not None:
            self._trace_ctx.__exit__(None, None, None)
            self._trace_ctx = None
        if timer:
            timer.dump(self.exp_dir / "profile_simple.json")
        return state
