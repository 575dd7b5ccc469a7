from .state import TrainState, TrainConfig, create_train_state, split_params
from .train_step import make_train_step
