from heat_tpu.models.state import TrainState, init_train_state
from heat_tpu.models.aggregator import aggregate_history

__all__ = ["TrainState", "init_train_state", "aggregate_history"]
