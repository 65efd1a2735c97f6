"""UNet-only depth regression trainer (reference trainer/trainer_unet.py).

Forward: UNet -> (optional resize/crop) -> sigmoid renormalization to the
dataset depth range; loss = mean MSE against the GT depth map.  Validation
dumps predicted depth maps as .exr (reference trainer_unet.py:65-78).
"""

from __future__ import annotations

from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

from sv3d_tpu.config import Config
from sv3d_tpu.data.datasets import DepthDataset
from sv3d_tpu.io.exr import write_exr
from sv3d_tpu.models.unet import UNet, UNetMini, renormalize_depth, resize_crop_depth
from sv3d_tpu.training.loop import BaseTrainer
from sv3d_tpu.training.optim import build_optimizer
from sv3d_tpu.training.state import TrainState, create_train_state


def depth_forward(model, config, variables, rgb, train: bool):
    """rgb (B,H,W,3) -> (B,240,320) renormalized depth (+ mutated stats)."""
    out = model.apply(
        variables, rgb, train=train, mutable=["batch_stats"] if train else False
    )
    logits, mutated = out if train else (out, None)
    logits = logits.astype(jnp.float32)
    if config.resize_input:
        logits = resize_crop_depth(logits)
    depth = renormalize_depth(logits[..., 0], config.min_z, config.max_z)
    return depth, mutated


def make_train_step(model, config: Config):
    @jax.jit
    def step(state: TrainState, rgb, target):
        def loss_fn(params):
            depth, mutated = depth_forward(
                model, config, {"params": params, "batch_stats": state.batch_stats},
                rgb, True,
            )
            loss = jnp.mean((depth - target) ** 2)
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
        return state, {"train_loss": loss}

    return step


def make_eval_step(model, config: Config):
    @jax.jit
    def step(state: TrainState, rgb, target):
        depth, _ = depth_forward(
            model, config, {"params": state.params, "batch_stats": state.batch_stats},
            rgb, False,
        )
        return depth, {"val_loss": jnp.mean((depth - target) ** 2)}

    return step


class DepthRegressorTrainer(BaseTrainer):
    monitor = "val_loss"

    def __init__(self, config: Config, **kw):
        super().__init__(config, **kw)
        dt = None if config.precision == 32 else config.dtype
        self.model = (
            UNet(channels_out=1, dtype=dt)
            if config.resize_input
            else UNetMini(channels_out=1, dtype=dt)
        )
        self._train_step = make_train_step(self.model, config)
        self._eval_step = make_eval_step(self.model, config)

    def build_state(self, rng_key):
        h = w = self.config.W
        if not self.config.resize_input:
            h, w = 240, 320
        variables = jax.jit(
            lambda k: self.model.init(k, jnp.zeros((1, h, w, 3)), train=False)
        )(rng_key)
        tx = build_optimizer(self.config.lr, variables["params"])
        return create_train_state(self.model, variables, tx)

    def train_dataset(self):
        c = self.config
        return DepthDataset(
            "train", c.datasetdir, c.splitsdir, c.resize_input, c.W, seed=c.seed
        )

    def val_dataset(self):
        c = self.config
        return DepthDataset(
            "val", c.datasetdir, c.splitsdir, c.resize_input, c.W, seed=c.seed
        )

    def train_step(self, state, batch, rng_key):
        return self._train_step(state, batch["input"], batch["target"])

    def eval_step(self, state, batch):
        _, metrics = self._eval_step(state, batch["input"], batch["target"])
        return metrics

    def visualize(self, state, batch, out_dir: Path):
        depth, _ = self._eval_step(state, batch["input"], batch["target"])
        import numpy as np

        for i, name in enumerate(batch["name"]):
            d = out_dir / name
            d.mkdir(parents=True, exist_ok=True)
            write_exr(d / "depth_map.exr", np.asarray(depth[i]))


def train_unet(config: Config, max_steps=None):
    return DepthRegressorTrainer(config).fit(max_steps=max_steps)


def cli_main():
    from sv3d_tpu.training.cli import parse_config

    train_unet(parse_config())


if __name__ == "__main__":
    cli_main()
