from .mesh import make_mesh, param_shardings, batch_shardings, DATA_AXIS, MODEL_AXIS
from .train_step import TrainState, TrainConfig, make_train_step, make_eval_step, create_train_state

__all__ = [
    "make_mesh",
    "param_shardings",
    "batch_shardings",
    "DATA_AXIS",
    "MODEL_AXIS",
    "TrainState",
    "TrainConfig",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
]
