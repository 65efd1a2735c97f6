from sv3d_tpu.training.state import TrainState, create_train_state
from sv3d_tpu.training.optim import build_optimizer

__all__ = ["TrainState", "create_train_state", "build_optimizer"]
