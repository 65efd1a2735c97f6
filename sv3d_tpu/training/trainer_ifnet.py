"""IF-Net-only trainer on precomputed depth grids
(reference trainer/trainer_ifnet.py).

Loss: binary cross-entropy with logits, summed over points then meaned over
the batch (reference trainer_ifnet.py:44-47).  Validation extracts a mesh from
the prediction and the GT distance field (reference trainer_ifnet.py:49-56).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sv3d_tpu.config import Config
from sv3d_tpu.data.datasets import ImplicitDataset
from sv3d_tpu.models.ifnet import IFNet
from sv3d_tpu.training.loop import BaseTrainer
from sv3d_tpu.training.optim import build_optimizer
from sv3d_tpu.training.state import TrainState, create_train_state


def make_train_step(model):
    @jax.jit
    def step(state: TrainState, grid, points, occupancies):
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                grid, points, train=True, mutable=["batch_stats"],
            )
            ce = optax.sigmoid_binary_cross_entropy(logits, occupancies)
            # sum over points, mean over batch (reference trainer_ifnet.py:46)
            return jnp.mean(jnp.sum(ce, axis=-1)), mutated

        (loss, mutated), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=mutated["batch_stats"])
        return state, {"train_ce_loss": loss}

    return step


def make_eval_step(model):
    @jax.jit
    def step(state: TrainState, grid, points, occupancies):
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            grid, points, train=False,
        )
        ce = optax.sigmoid_binary_cross_entropy(logits, occupancies)
        return {"val_ce_loss": jnp.mean(jnp.sum(ce, axis=-1))}

    return step


class ImplicitRefinementTrainer(BaseTrainer):
    monitor = "val_ce_loss"

    def __init__(self, config: Config, **kw):
        super().__init__(config, **kw)
        dt = None if config.precision == 32 else config.dtype
        self.model = IFNet(config.ifnet(), dtype=dt, mesh=self.mesh)
        self._train_step = make_train_step(self.model)
        self._eval_step = make_eval_step(self.model)

    def build_state(self, rng_key):
        dims = self.config.dims
        variables = jax.jit(
            lambda k: self.model.init(
                k, jnp.zeros((1, *dims, 1)), jnp.zeros((1, 8, 3)), train=False
            )
        )(rng_key)
        tx = build_optimizer(self.config.lr, variables["params"])
        return create_train_state(self.model, variables, tx)

    def train_dataset(self):
        c = self.config
        return ImplicitDataset("train", c.datasetdir, c.num_points, c.splitsdir, seed=c.seed)

    def val_dataset(self):
        c = self.config
        return ImplicitDataset("val", c.datasetdir, c.num_points, c.splitsdir, seed=c.seed)

    def train_step(self, state, batch, rng_key):
        return self._train_step(state, batch["input"], batch["points"], batch["occupancies"])

    def eval_step(self, state, batch):
        return self._eval_step(state, batch["input"], batch["points"], batch["occupancies"])

    def visualize(self, state, batch, out_dir: Path):
        from sv3d_tpu.inference.dense_grid import implicit_to_mesh
        from sv3d_tpu.utils.visualize import visualize_sdf

        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for i, name in enumerate(batch["name"]):
            implicit_to_mesh(
                self.model, variables, batch["input"][i : i + 1],
                self.config.dims, 0.5, out_dir / f"{name}_predicted.obj",
                res_increase=self.config.inf_res,
            )
            if "target" in batch:
                visualize_sdf(
                    np.asarray(batch["target"][i])[..., 0],
                    out_dir / f"{name}_gt.obj", level=1.0,
                )


def train_implicit_refinement(config: Config, max_steps=None):
    return ImplicitRefinementTrainer(config).fit(max_steps=max_steps)


def cli_main():
    from sv3d_tpu.training.cli import parse_config

    train_implicit_refinement(parse_config())


if __name__ == "__main__":
    cli_main()
