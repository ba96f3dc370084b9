from .state import TrainState, create_train_state, dict_optimizers
from .trainer import ProgressionTrainer

__all__ = ["TrainState", "create_train_state", "dict_optimizers",
           "ProgressionTrainer"]
