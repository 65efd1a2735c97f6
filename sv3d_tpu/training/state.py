"""Train state: params + batch-norm statistics + optimizer state."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with mutable batch_stats (the UNet and IF-Net
    encoders use BatchNorm; reference model/unet.py:50-64, model/ifnet.py:78-80)."""

    batch_stats: Any = None


def create_train_state(model, variables, tx) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
